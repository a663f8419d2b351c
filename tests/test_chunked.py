"""Chunked container + v1 archive tests (CPU backend)."""

import numpy as np
import pytest

from trico_tpu import chunked
from trico_tpu.archive import ArchiveReader, ArchiveWriter
from conftest import mesh_like_floats


@pytest.mark.parametrize("n", [0, 5, 4096, 4100, 10000])
@pytest.mark.parametrize("bits", [32, 64])
def test_container_roundtrip(n, bits):
    dt = np.float32 if bits == 32 else np.float64
    vals = mesh_like_floats(n, seed=n, dtype=dt).view(np.uint32 if bits == 32 else np.uint64)
    blob = chunked.encode_chunked(vals, chunk_len=1024)
    out, got_bits = chunked.decode_chunked(blob)
    assert got_bits == bits
    np.testing.assert_array_equal(out, vals)


def test_tpu_and_host_paths_bitwise_identical():
    vals = mesh_like_floats(5000, seed=1).view(np.uint32)
    a = chunked.encode_chunked(vals, chunk_len=512, use_tpu=True)  # jax (cpu backend)
    b = chunked.encode_chunked(vals, chunk_len=512, use_tpu=False)  # host codec
    assert a == b


def test_ratio_cost_of_chunking(bunny_vertices):
    """Chunk warm-up should cost only a few percent on real mesh data."""
    x = np.ascontiguousarray(bunny_vertices[:, 0]).view(np.uint32)
    from trico_tpu.codec import fp_ref

    full = len(fp_ref.compress(x, 4, 10))
    ch = len(chunked.encode_chunked(x, chunk_len=4096, use_tpu=False))
    assert ch < full * 1.06, (ch, full)


def test_v1_archive_all_fp_stream_kinds():
    rng = np.random.default_rng(0)
    n = 3000
    verts = np.stack([mesh_like_floats(n, s) for s in (1, 2, 3)], axis=1)
    verts64 = verts.astype(np.float64)
    uv = verts[:, :2].copy()
    attrs = mesh_like_floats(n, 4)
    tris = rng.integers(0, n, (n, 3)).astype(np.uint32)

    w = ArchiveWriter(chunk_len=1024)
    w.write_vertices(verts)
    w.write_vertices_double(verts64)
    w.write_uv_per_vertex(uv)
    w.write_attributes_float(attrs)
    w.write_triangles(tris)
    blob = w.tobytes()

    r = ArchiveReader(blob)
    assert r.version == 1
    np.testing.assert_array_equal(r.read_vertices(), verts)
    np.testing.assert_array_equal(r.read_vertices_double(), verts64)
    np.testing.assert_array_equal(r.read_uv_per_vertex(), uv)
    np.testing.assert_array_equal(r.read_attributes_float(), attrs)
    np.testing.assert_array_equal(r.read_triangles(), tris)


def test_v1_archive_skip():
    w = ArchiveWriter(chunk_len=256)
    w.write_vertices(np.zeros((1000, 3), np.float32))
    w.write_attributes_uint8(np.arange(5, dtype=np.uint8))
    r = ArchiveReader(w.tobytes())
    r.skip_next_stream()
    np.testing.assert_array_equal(r.read_attributes_uint8(), np.arange(5, dtype=np.uint8))


def test_bad_version_rejected():
    import struct

    blob = struct.pack("<II", 0x6F637254, 7)
    with pytest.raises(ValueError):
        ArchiveReader(blob)


def test_lz4_chunked_container_roundtrip():
    r = np.random.default_rng(0)
    for data in [np.zeros(50000, np.uint8),
                 r.integers(0, 8, 40000).astype(np.uint8),
                 np.arange(100, dtype=np.uint8),
                 np.zeros(0, np.uint8)]:
        blob = chunked.encode_lz4_chunked(data)
        out = chunked.decode_lz4_chunked(blob)
        np.testing.assert_array_equal(out, data)


def test_v1_archive_integer_streams_chunked():
    rng = np.random.default_rng(5)
    tris = rng.integers(0, 30000, (50000, 3)).astype(np.uint32)
    colors = rng.integers(0, 2**32, 30000).astype(np.uint32)
    w = ArchiveWriter(chunk_len=1024)
    w.write_triangles(tris)
    w.write_vertex_colors(colors)
    r = ArchiveReader(w.tobytes())
    np.testing.assert_array_equal(r.read_triangles(), tris)
    np.testing.assert_array_equal(r.read_vertex_colors(), colors)


def test_tpu_layout_container_roundtrip_both_hosts():
    from conftest import mesh_like_floats

    vals = mesh_like_floats(4096 + 100, seed=11).view(np.uint32)  # has tail
    a = chunked.encode_chunked(vals, chunk_len=512, use_tpu=True, layout="tpu")
    b = chunked.encode_chunked(vals, chunk_len=512, use_tpu=False, layout="tpu")
    assert a == b  # device and host producers agree bit-for-bit
    for blob in (a,):
        for use_tpu in (True, False):
            out, bits = chunked.decode_chunked(blob, use_tpu=use_tpu)
            assert bits == 32
            np.testing.assert_array_equal(out, vals)


def test_tpu_layout_same_size_as_ref_layout():
    from conftest import mesh_like_floats

    vals = mesh_like_floats(2048, seed=12).view(np.uint32)
    a = chunked.encode_chunked(vals, chunk_len=512, layout="ref")
    b = chunked.encode_chunked(vals, chunk_len=512, layout="tpu")
    assert len(a) == len(b)


def test_mixed_exponent_container_decodes():
    """Per-chunk hash_info is authoritative: a container whose chunks carry
    different exponents must decode exactly on every path (round-1 VERDICT
    weak #5 — decode used to trust chunk 0's header for all chunks)."""
    import struct

    from conftest import mesh_like_floats
    from trico_tpu.chunked import _host_fp_encode

    L = 256
    vals = mesh_like_floats(4 * L, seed=21).view(np.uint32)
    exps = [(4, 10), (4, 8), (6, 12), (4, 10)]
    payloads = [
        _host_fp_encode(vals[i * L : (i + 1) * L], e1, e2)
        for i, (e1, e2) in enumerate(exps)
    ]
    head = struct.pack("<BBIII", 1, 0, L, len(vals), len(payloads))
    sizes_blob = struct.pack(f"<{len(payloads)}I", *[len(p) for p in payloads])
    blob = head + sizes_blob + b"".join(payloads)
    for use_tpu in (True, False):
        out, bits = chunked.decode_chunked(blob, use_tpu=use_tpu)
        assert bits == 32
        np.testing.assert_array_equal(out, vals)


def test_parallel_lz4_block_decode_matches_serial():
    """native.lz4_decompress_blocks (threaded) == per-block serial decode."""
    from trico_tpu import native

    if not native.available():
        import pytest

        pytest.skip("no native")
    rng = np.random.default_rng(7)
    plane = rng.integers(0, 8, 300_000).astype(np.uint8)  # compressible
    blob = chunked.encode_lz4_chunked(plane, block_len=4096)
    out = chunked.decode_lz4_chunked(blob)
    np.testing.assert_array_equal(out, plane)
    # corrupt one block: the batch decoder must report it
    mut = bytearray(blob)
    mut[len(mut) // 2] ^= 0xFF
    try:
        bad = chunked.decode_lz4_chunked(bytes(mut))
        assert not np.array_equal(bad, plane)
    except (ValueError, RuntimeError):
        pass


def test_adaptive_chunked_roundtrip_and_smaller():
    """Per-chunk adaptive exponents (device argmin over F32_TPU_CANDIDATES):
    container decodes exactly on every path, never larger than any single
    fixed candidate, and host/device producers agree bit-for-bit."""
    from conftest import mesh_like_floats
    from trico_tpu.codec.fp_jax import F32_TPU_CANDIDATES

    vals = mesh_like_floats(8 * 512 + 100, seed=31).view(np.uint32)
    a = chunked.encode_chunked(vals, chunk_len=512, use_tpu=True,
                               layout="tpu", optimize=True)
    b = chunked.encode_chunked(vals, chunk_len=512, use_tpu=False,
                               layout="tpu", optimize=True)
    assert a == b
    for use_tpu in (True, False):
        out, bits = chunked.decode_chunked(a, use_tpu=use_tpu)
        assert bits == 32
        np.testing.assert_array_equal(out, vals)
    for e1, e2 in F32_TPU_CANDIDATES:
        fixed = chunked.encode_chunked(vals, chunk_len=512, e1=e1, e2=e2,
                                       layout="tpu")
        assert len(a) <= len(fixed)


def test_adaptive_ref_layout_roundtrip():
    from conftest import mesh_like_floats

    vals = mesh_like_floats(4 * 256, seed=32).view(np.uint32)
    a = chunked.encode_chunked(vals, chunk_len=256, use_tpu=True,
                               layout="ref", optimize=True)
    b = chunked.encode_chunked(vals, chunk_len=256, use_tpu=False,
                               layout="ref", optimize=True)
    assert a == b
    out, _ = chunked.decode_chunked(a, use_tpu=False)
    np.testing.assert_array_equal(out, vals)


def test_v1_archive_adaptive_default():
    """ArchiveWriter(chunk_len=...) now adapts exponents per chunk."""
    from conftest import mesh_like_floats

    verts = np.stack([mesh_like_floats(3000, s) for s in (0, 1, 2)], axis=1)
    w_opt = ArchiveWriter(chunk_len=512)
    w_opt.write_vertices(verts)
    w_fix = ArchiveWriter(chunk_len=512, optimize=False)
    w_fix.write_vertices(verts)
    assert len(w_opt.tobytes()) <= len(w_fix.tobytes())
    r = ArchiveReader(w_opt.tobytes())
    np.testing.assert_array_equal(
        r.read_vertices().view(np.uint32), verts.view(np.uint32))


def test_fill_container_roundtrip():
    """Constant byte planes ride the 19-byte "fill" kind (FORMAT.md §4)."""
    cont = chunked.encode_fill(0x7F, 1_000_000)
    assert len(cont) == 19
    out = chunked.decode_fill(cont)
    assert out.shape == (1_000_000,) and np.all(out == 0x7F)
    # decode_lz4_chunked dispatches fill transparently (reader call sites)
    np.testing.assert_array_equal(chunked.decode_lz4_chunked(cont), out)
    hdr = chunked.parse_container_header(cont)
    assert hdr.kind == "fill" and hdr.total == 1_000_000


def test_encode_int_best_emits_fill_for_constant_planes():
    """u64 indices below 2^16: planes 2..7 are constant zero -> fill."""
    tris = np.arange(3 * 40_000, dtype=np.uint64) % 40_000
    subs = chunked.encode_int_best(tris)
    hdrs = [chunked.parse_container_header(s) for s in subs]
    kinds = [h.kind for h in hdrs]
    assert kinds.count("fill") >= 5  # planes 2..7 constant (and maybe more)
    # full round-trip through the reader path
    from trico_tpu.codec import transpose

    planes = [chunked.decode_lz4_chunked(s) for s in subs]
    back = transpose.from_byte_planes(planes, np.uint64)
    np.testing.assert_array_equal(back, tris)


def test_fill_container_corrupt_rejected():
    cont = bytearray(chunked.encode_fill(3, 1000))
    cont2 = bytearray(cont)
    cont2[2:6] = (999).to_bytes(4, "little")  # chunk_len != total
    with pytest.raises(ValueError):
        chunked.decode_fill(bytes(cont2))
    with pytest.raises(ValueError):
        chunked.decode_fill(bytes(cont[:-1]))  # truncated payload


@pytest.mark.parametrize("layout,optimize", [("ref", True), ("ref", False),
                                             ("tpu", True), ("tpu", False)])
def test_f64_odd_chunk_len_rounds_before_chunking(layout, optimize):
    """An odd f64 chunk_len is rounded to even BEFORE n_chunks is computed.

    Regression: the TPU branch used to round after n_chunks was derived from
    the odd value, so the ref-layout adaptive fallthrough sliced fewer
    values than the container declared — silently dropping the tail (caught
    as a framing error on decode at best)."""
    vals = mesh_like_floats(1025, seed=31, dtype=np.float64).view(np.uint64)
    cont = chunked.encode_chunked(vals, chunk_len=513, use_tpu=True,
                                  optimize=optimize, layout=layout)
    hdr = chunked.parse_container_header(cont)
    assert hdr.chunk_len == 512
    out, _ = chunked.decode_chunked(cont)
    np.testing.assert_array_equal(out, vals)


def test_fast_profile_roundtrips_and_uses_small_tables():
    """optimize="fast" (CLI --fast): v1 chunks only ever pick small-table
    candidates (device-decodable), v0 uses the fixed default exponents;
    both stay bit-exact."""
    from trico_tpu.codec.fp_jax import F32_TPU_CANDIDATES_FAST

    vals = mesh_like_floats(20_000, seed=41).view(np.uint32)
    cont = chunked.encode_chunked(vals, chunk_len=4096, optimize="fast")
    out, _ = chunked.decode_chunked(cont)
    np.testing.assert_array_equal(out, vals)
    hdr, sizes, off = chunked.parse_validated_framing(cont)
    fast_infos = {((e1 // 2) << 4) | (e2 // 2)
                  for (e1, e2) in F32_TPU_CANDIDATES_FAST}
    pos = off
    for k, sz in enumerate(sizes):
        if (k + 1) * hdr.chunk_len <= hdr.total:  # full chunks only
            assert cont[pos] in fast_infos
        pos += sz

    # archive level: v0 --fast == fixed default exponents (reference-
    # decodable) and the search genuinely diverges on this data — the bunny
    # is where the candidate search wins, so equality with optimize=False
    # would be vacuous on smooth synthetic floats (regression: "fast" was
    # once collapsed to bool True by `optimize and not chunk_len`)
    from trico_tpu.archive import ArchiveReader, ArchiveWriter
    from trico_tpu.io import stl
    from conftest import BUNNY

    if not BUNNY.exists():
        pytest.skip("StanfordBunny.stl fixture not available")
    verts, _ = stl.read_stl(BUNNY)
    verts = verts[:20_000]
    w_fast = ArchiveWriter(optimize="fast")
    w_fast.write_vertices(verts)
    w_fixed = ArchiveWriter(optimize=False)
    w_fixed.write_vertices(verts)
    w_search = ArchiveWriter(optimize=True)
    w_search.write_vertices(verts)
    assert w_fast.tobytes() == w_fixed.tobytes()
    assert len(w_search.tobytes()) < len(w_fast.tobytes())
    r = ArchiveReader(w_fast.tobytes())
    np.testing.assert_array_equal(
        r.read_vertices().view(np.uint32), verts.view(np.uint32))

    w1 = ArchiveWriter(chunk_len=4096, optimize="fast")
    w1.write_vertices(verts)
    r1 = ArchiveReader(w1.tobytes())
    np.testing.assert_array_equal(
        r1.read_vertices().view(np.uint32), verts.view(np.uint32))
