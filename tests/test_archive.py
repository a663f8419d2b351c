"""Archive container tests: framing, round-trips of all 20 stream types,
peek/skip semantics, and golden byte/interop checks vs the reference library."""

import ctypes
import struct

import numpy as np
import pytest

import ref_oracle
from trico_tpu.archive import ArchiveReader, ArchiveWriter, StreamType
from conftest import mesh_like_floats


def test_empty_archive_is_8_bytes():
    w = ArchiveWriter()
    data = w.tobytes()
    assert len(data) == 8
    r = ArchiveReader(data)
    assert r.version == 0
    assert r.next_stream_type == StreamType.empty


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        ArchiveReader(b"XXXXXXXXXX")
    with pytest.raises(ValueError):
        ArchiveReader(b"\x00" * 4)


def _verts(n=1000, seed=0, dtype=np.float32):
    x = mesh_like_floats(n, seed, dtype)
    y = mesh_like_floats(n, seed + 1, dtype)
    z = mesh_like_floats(n, seed + 2, dtype)
    return np.stack([x, y, z], axis=1)


def test_vertices_triangles_roundtrip():
    verts = _verts(35947)
    tris = np.random.default_rng(0).integers(0, 35947, (69451, 3)).astype(np.uint32)
    w = ArchiveWriter()
    w.write_vertices(verts)
    w.write_triangles(tris)
    r = ArchiveReader(w.tobytes())
    assert r.next_stream_type == StreamType.vertex_float
    assert r.num_vertices() == 35947
    np.testing.assert_array_equal(r.read_vertices(), verts)
    assert r.num_triangles() == 69451
    np.testing.assert_array_equal(r.read_triangles(), tris)
    assert r.next_stream_type == StreamType.empty


def test_all_stream_types_roundtrip():
    rng = np.random.default_rng(1)
    n = 503
    data = {
        "vertices": _verts(n),
        "vertices_double": _verts(n, 3, np.float64),
        "triangles": rng.integers(0, n, (n, 3)).astype(np.uint32),
        "triangles_long": rng.integers(0, 2**40, (n, 3)).astype(np.uint64),
        "uv_per_vertex": _verts(n)[:, :2].copy(),
        "uv_per_vertex_double": _verts(n, 5, np.float64)[:, :2].copy(),
        "uv_per_triangle": rng.normal(size=(n, 6)).astype(np.float32),
        "uv_per_triangle_double": rng.normal(size=(n, 6)).astype(np.float64),
        "vertex_normals": _verts(n, 7),
        "vertex_normals_double": _verts(n, 8, np.float64),
        "triangle_normals": _verts(n, 9),
        "triangle_normals_double": _verts(n, 10, np.float64),
        "vertex_colors": rng.integers(0, 2**32, n).astype(np.uint32),
        "triangle_colors": rng.integers(0, 2**32, n).astype(np.uint32),
        "attributes_float": mesh_like_floats(n, 11),
        "attributes_double": mesh_like_floats(n, 12, np.float64),
        "attributes_uint8": rng.integers(0, 256, n).astype(np.uint8),
        "attributes_uint16": rng.integers(0, 2**16, n).astype(np.uint16),
        "attributes_uint32": rng.integers(0, 2**32, n).astype(np.uint32),
        "attributes_uint64": rng.integers(0, 2**63, n).astype(np.uint64),
    }
    w = ArchiveWriter()
    for name, arr in data.items():
        getattr(w, f"write_{name}")(arr)
    r = ArchiveReader(w.tobytes())
    for name, arr in data.items():
        out = getattr(r, f"read_{name}")()
        np.testing.assert_array_equal(out.reshape(arr.shape), arr, err_msg=name)
    assert r.next_stream_type == StreamType.empty


def test_skip_and_generic_iteration():
    w = ArchiveWriter()
    w.write_vertices(_verts(100))
    w.write_triangles(np.zeros((50, 3), np.uint32))
    w.write_attributes_uint8(np.arange(7, dtype=np.uint8))
    r = ArchiveReader(w.tobytes())
    r.skip_next_stream()
    assert r.next_stream_type == StreamType.triangle_uint32
    r.skip_next_stream()
    np.testing.assert_array_equal(r.read_attributes_uint8(), np.arange(7, dtype=np.uint8))

    r2 = ArchiveReader(w.tobytes())
    kinds = [st for st, _ in r2.streams()]
    assert kinds == [StreamType.vertex_float, StreamType.triangle_uint32, StreamType.attribute_uint8]


def test_wrong_type_read_raises():
    w = ArchiveWriter()
    w.write_vertices(_verts(10))
    r = ArchiveReader(w.tobytes())
    with pytest.raises(ValueError):
        r.read_triangles()
    # archive still usable afterwards? reference returns 0 and keeps state; we
    # raise before consuming anything, so the stream is still readable:
    np.testing.assert_array_equal(r.read_vertices(), _verts(10))


def test_python_fallback_backend():
    verts = _verts(200)
    tris = np.random.default_rng(2).integers(0, 200, (100, 3)).astype(np.uint32)
    w = ArchiveWriter(use_native=False)
    w.write_vertices(verts)
    w.write_triangles(tris)
    r = ArchiveReader(w.tobytes(), use_native=False)
    np.testing.assert_array_equal(r.read_vertices(), verts)
    np.testing.assert_array_equal(r.read_triangles(), tris)
    # cross: native reader reads python-written archive
    r2 = ArchiveReader(w.tobytes(), use_native=True)
    np.testing.assert_array_equal(r2.read_vertices(), verts)
    np.testing.assert_array_equal(r2.read_triangles(), tris)


# ---------------------------------------------------------------- golden


needs_ref = pytest.mark.skipif(ref_oracle.get() is None, reason="reference library unavailable")


def _ref_archive_bytes(build):
    lib = ref_oracle.get()
    arch = lib.trico_open_archive_for_writing(1 << 20)
    build(lib, arch)
    size = lib.trico_get_size(arch)
    buf = ctypes.string_at(lib.trico_get_buffer_pointer(arch), size)
    lib.trico_close_archive(arch)
    return buf


@needs_ref
def test_fp_only_archive_bytes_identical_to_reference():
    verts = _verts(35947, seed=4)
    normals = _verts(35947, seed=9)

    def build(lib, arch):
        p = verts.ctypes.data_as(ctypes.c_void_p)
        assert lib.trico_write_vertices(arch, p, len(verts))
        q = normals.ctypes.data_as(ctypes.c_void_p)
        assert lib.trico_write_vertex_normals(arch, q, len(normals))

    ref = _ref_archive_bytes(build)
    w = ArchiveWriter()
    w.write_vertices(verts)
    w.write_vertex_normals(normals)
    assert w.tobytes() == ref


@needs_ref
def test_reference_written_archive_reads_back():
    verts = _verts(5000, seed=13)
    tris = np.random.default_rng(3).integers(0, 5000, (9000, 3)).astype(np.uint32)
    colors = np.random.default_rng(4).integers(0, 2**32, 5000).astype(np.uint32)

    def build(lib, arch):
        assert lib.trico_write_vertices(arch, verts.ctypes.data_as(ctypes.c_void_p), len(verts))
        assert lib.trico_write_triangles(arch, tris.ctypes.data_as(ctypes.c_void_p), len(tris))
        assert lib.trico_write_vertex_colors(arch, colors.ctypes.data_as(ctypes.c_void_p), len(colors))

    r = ArchiveReader(_ref_archive_bytes(build))
    np.testing.assert_array_equal(r.read_vertices(), verts)
    np.testing.assert_array_equal(r.read_triangles(), tris)
    np.testing.assert_array_equal(r.read_vertex_colors(), colors)


@needs_ref
def test_reference_reads_our_archive():
    """Reference library must decode archives we write (vertices + triangles)."""
    lib = ref_oracle.get()
    verts = _verts(3000, seed=21)
    tris = np.random.default_rng(5).integers(0, 3000, (6000, 3)).astype(np.uint32)
    w = ArchiveWriter()
    w.write_vertices(verts)
    w.write_triangles(tris)
    blob = w.tobytes()

    lib.trico_read_vertices.restype = ctypes.c_int
    lib.trico_read_vertices.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.trico_read_triangles.restype = ctypes.c_int
    lib.trico_read_triangles.argtypes = [ctypes.c_void_p, ctypes.c_void_p]

    buf = ctypes.create_string_buffer(blob, len(blob))
    arch = lib.trico_open_archive_for_reading(buf, len(blob))
    assert arch
    vout = np.zeros_like(verts)
    pv = ctypes.c_void_p(vout.ctypes.data)
    assert lib.trico_read_vertices(arch, ctypes.byref(pv))
    np.testing.assert_array_equal(vout, verts)
    tout = np.zeros_like(tris)
    pt = ctypes.c_void_p(tout.ctypes.data)
    assert lib.trico_read_triangles(arch, ctypes.byref(pt))
    np.testing.assert_array_equal(tout, tris)
    lib.trico_close_archive(arch)
