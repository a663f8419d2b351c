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
