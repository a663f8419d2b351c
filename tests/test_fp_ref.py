"""FP codec oracle tests: closed-form vectorized encoder vs sequential emulator,
round-trip, and format edge cases (tail sentinel, exponent clamping)."""

import numpy as np
import pytest

from trico_tpu.codec import fp_ref
from seq_oracle import seq_compress
from conftest import mesh_like_floats


@pytest.mark.parametrize("n", [0, 1, 2, 7, 8, 9, 16, 1000, 1003])
@pytest.mark.parametrize("e", [(4, 10), (0, 0), (2, 4), (10, 20), (30, 30), (5, 7)])
def test_f32_matches_sequential(n, e):
    vals = mesh_like_floats(n, seed=n)
    assert fp_ref.compress(vals, *e) == seq_compress(vals, *e)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 8, 999, 1000])
@pytest.mark.parametrize("e", [(20, 20), (0, 0), (4, 10), (30, 30)])
def test_f64_matches_sequential(n, e):
    vals = mesh_like_floats(n, seed=n, dtype=np.float64)
    assert fp_ref.compress(vals, *e) == seq_compress(vals, *e)


@pytest.mark.parametrize("n", [1, 7, 8, 9, 64, 1003])
def test_f32_roundtrip(n):
    vals = mesh_like_floats(n, seed=n)
    comp = fp_ref.compress(vals)
    out = fp_ref.decompress_f32(comp)
    np.testing.assert_array_equal(out, vals.view(np.uint32))


@pytest.mark.parametrize("n", [1, 2, 3, 64, 999])
def test_f64_roundtrip(n):
    vals = mesh_like_floats(n, seed=n, dtype=np.float64)
    comp = fp_ref.compress(vals)
    out = fp_ref.decompress_f64(comp)
    np.testing.assert_array_equal(out, vals.view(np.uint64))


def test_random_bits_roundtrip():
    """Adversarial: pure random bits (incompressible) including zeros/denormals."""
    r = np.random.default_rng(42)
    vals = r.integers(0, 2**32, 4096, dtype=np.uint32)
    vals[::17] = 0
    comp = fp_ref.compress(vals)
    assert fp_ref.compress(vals) == seq_compress(vals, 4, 10)
    np.testing.assert_array_equal(fp_ref.decompress_f32(comp), vals)


def test_constant_stream_compresses_well():
    vals = np.full(8000, 1.25, dtype=np.float32)
    comp = fp_ref.compress(vals)
    # After warm-up every residual is 0 → ~3 tag bytes per 8 values.
    assert len(comp) < 8000 * 4 / 8
    np.testing.assert_array_equal(fp_ref.decompress_f32(comp), vals.view(np.uint32))


def test_exponent_clamping():
    vals = mesh_like_floats(100)
    # odd exponents round down; >30 clamps to 30 (fps.c:88-93)
    assert fp_ref.compress(vals, 5, 11) == fp_ref.compress(vals, 4, 10)
    assert fp_ref.compress(vals, 99, 99) == fp_ref.compress(vals, 30, 30)


def test_header_contents():
    vals = mesh_like_floats(10)
    comp = fp_ref.compress(vals, 4, 10)
    assert comp[0] == ((4 >> 1) << 4 | (10 >> 1))
    assert int.from_bytes(comp[1:5], "big") == 10


def test_compressed_bound():
    r = np.random.default_rng(7)
    for n in [0, 1, 7, 8, 9, 100]:
        vals = r.integers(0, 2**32, n, dtype=np.uint32)
        assert len(fp_ref.compress(vals)) <= fp_ref.compressed_bound(n, 32)
        vals64 = r.integers(0, 2**64, n, dtype=np.uint64)
        assert len(fp_ref.compress(vals64)) <= fp_ref.compressed_bound(n, 64)
