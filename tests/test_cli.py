"""End-to-end CLI tests: encode/decode round-trips and size vs the reference
encoder on the bunny fixture."""

import ctypes
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import ref_oracle
from trico_tpu import cli
from trico_tpu.archive import ArchiveReader
from trico_tpu.io import ply, stl


def test_encode_decode_bunny_stl(tmp_path, bunny_path):
    trc = tmp_path / "bunny.trc"
    assert cli.encoder_main(["-i", str(bunny_path), "-o", str(trc)]) == 0
    assert trc.exists()
    back = tmp_path / "back.stl"
    assert cli.decoder_main(["-i", str(trc), "-o", str(back)]) == 0
    v1, t1 = stl.read_stl(bunny_path)
    v2, t2 = stl.read_stl(back)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(t1, t2)


def test_bunny_compressed_size_beats_reference_target(tmp_path, bunny_path):
    """Compressed bunny must be <= the reference's own output size."""
    trc = tmp_path / "bunny.trc"
    cli.encoder_main(["-i", str(bunny_path), "-o", str(trc)])
    ours = trc.stat().st_size
    lib = ref_oracle.get()
    if lib is None:
        pytest.skip("reference unavailable")
    verts, tris = stl.read_stl(bunny_path)
    arch = lib.trico_open_archive_for_writing(1 << 20)
    assert lib.trico_write_vertices(arch, verts.ctypes.data_as(ctypes.c_void_p), len(verts))
    assert lib.trico_write_triangles(arch, np.ascontiguousarray(tris).ctypes.data_as(ctypes.c_void_p), len(tris))
    theirs = lib.trico_get_size(arch)
    lib.trico_close_archive(arch)
    assert ours <= theirs, f"ours {ours} > reference {theirs}"


def test_encode_decode_ply(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(500, 3)).astype(np.float32)
    nrm = rng.normal(size=(500, 3)).astype(np.float32)
    col = rng.integers(0, 2**32, 500).astype(np.uint32)
    tri = rng.integers(0, 500, (300, 3)).astype(np.uint32)
    uv = rng.random((300, 6)).astype(np.float32)
    src = tmp_path / "m.ply"
    ply.write_ply(src, v, nrm, col, tri, uv)
    trc = tmp_path / "m.trc"
    assert cli.encoder_main(["-i", str(src)]) == 0  # default output name
    assert trc.exists()
    back = tmp_path / "back.ply"
    assert cli.decoder_main(["-i", str(trc), "-o", str(back)]) == 0
    m = ply.read_ply(back)
    np.testing.assert_array_equal(m.vertices, v)
    np.testing.assert_array_equal(m.vertex_normals, nrm)
    np.testing.assert_array_equal(m.vertex_colors, col)
    np.testing.assert_array_equal(m.triangles, tri)
    np.testing.assert_array_equal(m.texcoords, uv)


def test_plyskip_flags(tmp_path):
    rng = np.random.default_rng(1)
    v = rng.normal(size=(50, 3)).astype(np.float32)
    nrm = rng.normal(size=(50, 3)).astype(np.float32)
    col = rng.integers(0, 2**32, 50).astype(np.uint32)
    tri = rng.integers(0, 50, (30, 3)).astype(np.uint32)
    src = tmp_path / "m.ply"
    ply.write_ply(src, v, nrm, col, tri)
    trc = tmp_path / "m.trc"
    cli.encoder_main(["-i", str(src), "-o", str(trc), "-plyskip", "normal", "-plyskip", "color"])
    kinds = [st.name for st, _ in ArchiveReader(trc.read_bytes()).streams()]
    assert kinds == ["vertex_float", "triangle_uint32"]


def test_stladd_flags(tmp_path, bunny_path):
    trc = tmp_path / "b.trc"
    cli.encoder_main(["-i", str(bunny_path), "-o", str(trc), "-stladd", "normal", "-stladd", "uint16"])
    kinds = [st.name for st, _ in ArchiveReader(trc.read_bytes()).streams()]
    assert kinds == ["vertex_float", "triangle_uint32", "triangle_normal_float", "attribute_uint16"]


def test_module_entrypoints_run(tmp_path, bunny_path):
    """python -m smoke check via console entry functions in a subprocess."""
    code = (
        "from trico_tpu.cli import encoder_main;"
        f"raise SystemExit(encoder_main(['-i', r'{bunny_path}', '-o', r'{tmp_path}/x.trc']))"
    )
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, cwd="/root/repo")
    assert res.returncode == 0, res.stderr
    assert (tmp_path / "x.trc").exists()


def test_cli_chunked_flag_roundtrip(tmp_path, bunny_path):
    """--chunked writes a version-1 archive (adaptive exponents + BP32
    pick-best) that decodes bit-exactly through the decoder CLI."""
    from trico_tpu import cli
    from trico_tpu.io import stl

    out_trc = tmp_path / "b.trc"
    assert cli.encoder_main(["-i", str(bunny_path), "-o", str(out_trc),
                             "--chunked", "2048"]) == 0
    import struct

    ver = struct.unpack_from("<I", out_trc.read_bytes(), 4)[0]
    assert ver == 1
    out_stl = tmp_path / "b.stl"
    assert cli.decoder_main(["-i", str(out_trc), "-o", str(out_stl)]) == 0
    v0, t0 = stl.read_stl(bunny_path)
    v1, t1 = stl.read_stl(out_stl)
    np.testing.assert_array_equal(v1.view(np.uint32), v0.view(np.uint32))
    np.testing.assert_array_equal(t1, t0)


def test_cli_ply_storage_ascii(tmp_path, bunny_path):
    from trico_tpu import cli
    from trico_tpu.io import ply, stl

    out_trc = tmp_path / "c.trc"
    assert cli.encoder_main(["-i", str(bunny_path), "-o", str(out_trc)]) == 0
    out_ply = tmp_path / "c.ply"
    assert cli.decoder_main(["-i", str(out_trc), "-o", str(out_ply),
                             "--ply-storage", "ascii"]) == 0
    assert out_ply.read_bytes().splitlines()[1] == b"format ascii 1.0"
    v0, _ = stl.read_stl(bunny_path)
    mesh = ply.read_ply(out_ply)
    np.testing.assert_array_equal(mesh.vertices.view(np.uint32),
                                  v0.view(np.uint32))
