"""Golden cross-compat tests against the compiled reference C library.

These pin true bit-compatibility: our encoder's bytes == reference encoder's
bytes; our decoder accepts reference bytes and vice versa.
"""

import numpy as np
import pytest

import ref_oracle
from trico_tpu import native
from trico_tpu.codec import fp_ref
from conftest import mesh_like_floats

pytestmark = pytest.mark.skipif(ref_oracle.get() is None, reason="reference library unavailable")


@pytest.mark.parametrize("n", [1, 7, 8, 9, 1000, 35947])
@pytest.mark.parametrize("e", [(4, 10), (2, 4), (20, 20)])
def test_fp32_bytes_identical_to_reference(n, e):
    vals = mesh_like_floats(n, seed=n).view(np.uint32)
    assert fp_ref.compress(vals, *e) == ref_oracle.ref_fp_compress(vals, *e)


@pytest.mark.parametrize("n", [1, 2, 3, 1001])
@pytest.mark.parametrize("e", [(20, 20), (4, 10)])
def test_fp64_bytes_identical_to_reference(n, e):
    vals = mesh_like_floats(n, seed=n, dtype=np.float64).view(np.uint64)
    assert fp_ref.compress(vals, *e) == ref_oracle.ref_fp_compress(vals, *e)


def test_fp32_decode_reference_bytes():
    vals = mesh_like_floats(12345, seed=5).view(np.uint32)
    comp = ref_oracle.ref_fp_compress(vals, 4, 10)
    np.testing.assert_array_equal(fp_ref.decompress_f32(comp), vals)
    if native.available():
        np.testing.assert_array_equal(native.fp_decode(comp, 32), vals)


def test_reference_decodes_our_fp32_bytes():
    vals = mesh_like_floats(12345, seed=6).view(np.uint32)
    comp = fp_ref.compress(vals, 4, 10)
    np.testing.assert_array_equal(ref_oracle.ref_fp_decompress(comp, 32), vals)


def test_reference_decodes_our_fp64_bytes():
    vals = mesh_like_floats(4321, seed=7, dtype=np.float64).view(np.uint64)
    comp = fp_ref.compress(vals, 20, 20)
    np.testing.assert_array_equal(ref_oracle.ref_fp_decompress(comp, 64), vals)


@pytest.mark.skipif(not native.available(), reason="no native lib")
class TestLZ4Interop:
    CASES = [
        b"hello world " * 1000,
        bytes(range(256)) * 100,
        np.random.default_rng(0).integers(0, 256, 100000).astype(np.uint8).tobytes(),
        np.arange(3 * 69451, dtype=np.uint32).view(np.uint8)[0::4].tobytes(),
        b"",
        b"short",
    ]

    @pytest.mark.parametrize("i", range(len(CASES)))
    def test_reference_decodes_our_blocks(self, i):
        data = self.CASES[i]
        comp = native.lz4_compress(data)
        assert ref_oracle.ref_lz4_decompress(comp, len(data)) == data

    @pytest.mark.parametrize("i", range(len(CASES)))
    def test_we_decode_reference_blocks(self, i):
        data = self.CASES[i]
        comp = ref_oracle.ref_lz4_compress(data)
        assert native.lz4_decompress(comp, len(data)).tobytes() == data

    def test_our_ratio_close_to_reference(self):
        # byte-planes of sequential triangle indices — the real integer workload
        idx = np.arange(3 * 69451, dtype=np.uint32)
        ours = theirs = 0
        for p in range(4):
            plane = idx.view(np.uint8)[p::4].tobytes()
            ours += len(native.lz4_compress(plane))
            theirs += len(ref_oracle.ref_lz4_compress(plane))
        assert ours <= theirs * 1.05, (ours, theirs)


@pytest.mark.parametrize("e", [(2, 8), (8, 14), (12, 18), (16, 20), (20, 22)])
def test_reference_decodes_adaptive_exponent_bytes(e):
    """Every adaptive-candidate exponent pair stays reference-decodable
    (hash_info is self-describing, fps.c:120-121/214-217)."""
    vals = mesh_like_floats(9999, seed=e[1]).view(np.uint32)
    comp = fp_ref.compress(vals, *e)
    assert comp == ref_oracle.ref_fp_compress(vals, *e)
    np.testing.assert_array_equal(ref_oracle.ref_fp_decompress(comp, 32), vals)


def test_reference_decodes_adaptive_archive(bunny_path):
    """A full adaptive-exponent v0 archive (the writer default) must be
    readable by the reference library, and smaller than its own output."""
    import ctypes

    from trico_tpu.archive import ArchiveWriter
    from trico_tpu.io import stl

    lib = ref_oracle.get()
    verts, tris = stl.read_stl(bunny_path)
    w = ArchiveWriter()
    w.write_vertices(verts)
    w.write_triangles(tris)
    blob = w.tobytes()
    assert len(blob) <= 584613  # reference's own output for these two streams

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
    np.testing.assert_array_equal(vout.view(np.uint32), verts.view(np.uint32))
    tout = np.zeros_like(tris)
    pt = ctypes.c_void_p(tout.ctypes.data)
    assert lib.trico_read_triangles(arch, ctypes.byref(pt))
    np.testing.assert_array_equal(tout, tris)
    lib.trico_close_archive(arch)
