"""Native C++ codec tests: bit-compat with the NumPy oracle, LZ4 round-trips."""

import numpy as np
import pytest

from trico_tpu import native
from trico_tpu.codec import fp_ref
from conftest import mesh_like_floats

pytestmark = pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")


@pytest.mark.parametrize("n", [0, 1, 7, 8, 9, 1000, 100003])
def test_fp32_native_matches_oracle(n):
    vals = mesh_like_floats(n, seed=n).view(np.uint32)
    assert native.fp_encode(vals, 4, 10) == fp_ref.compress(vals, 4, 10)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 999, 10000])
def test_fp64_native_matches_oracle(n):
    vals = mesh_like_floats(n, seed=n, dtype=np.float64).view(np.uint64)
    assert native.fp_encode(vals, 20, 20) == fp_ref.compress(vals, 20, 20)


@pytest.mark.parametrize("n", [1, 9, 100001])
def test_fp32_native_roundtrip(n):
    vals = mesh_like_floats(n, seed=n).view(np.uint32)
    comp = native.fp_encode(vals, 4, 10)
    np.testing.assert_array_equal(native.fp_decode(comp, 32), vals)


@pytest.mark.parametrize("n", [1, 2, 9999])
def test_fp64_native_roundtrip(n):
    vals = mesh_like_floats(n, seed=n, dtype=np.float64).view(np.uint64)
    comp = native.fp_encode(vals, 20, 20)
    np.testing.assert_array_equal(native.fp_decode(comp, 64), vals)


def test_fp32_native_decodes_oracle_output():
    vals = mesh_like_floats(5000, seed=3).view(np.uint32)
    comp = fp_ref.compress(vals, 6, 12)
    np.testing.assert_array_equal(native.fp_decode(comp, 32), vals)


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"hello world " * 100,
        bytes(range(256)) * 40,
        b"\x00" * 10000,
        np.random.default_rng(0).integers(0, 256, 50000).astype(np.uint8).tobytes(),
        np.random.default_rng(1).integers(0, 4, 50000).astype(np.uint8).tobytes(),
        b"abcdefgh" * 3 + b"x",  # short input below MFLIMIT handling
    ],
    ids=["empty", "one", "text", "cycle", "zeros", "random", "lowent", "short"],
)
def test_lz4_roundtrip(data):
    comp = native.lz4_compress(data)
    out = native.lz4_decompress(comp, len(data))
    assert out.tobytes() == data


def test_lz4_compresses_repetitive():
    data = b"0123456789abcdef" * 4096
    comp = native.lz4_compress(data)
    assert len(comp) < len(data) // 20


def test_lz4_ratio_on_byte_planes():
    """Byte-plane-shuffled triangle indices should compress well (the trico
    integer path int_compression.cpp:75-158 relies on this)."""
    idx = np.arange(0, 3 * 69451, dtype=np.uint32)  # sequential indices
    planes = idx.view(np.uint8).reshape(-1, 4).T.copy()
    total = sum(len(native.lz4_compress(p.tobytes())) for p in planes)
    assert total < idx.nbytes / 10


def test_lz4_corrupt_rejected():
    data = b"some compressible data " * 50
    comp = bytearray(native.lz4_compress(data))
    comp = comp[: len(comp) // 2]  # truncate
    with pytest.raises(ValueError):
        native.lz4_decompress(bytes(comp), len(data))


def test_pool_concurrent_python_threads():
    """Hammer the native thread pool from multiple Python threads at once
    (VERDICT r3 weak #5): concurrent batch jobs must produce the same bytes
    as serial runs — exercises the pool's nested-dispatch guard and the
    epoch/condvar handshake under contention. Run under the sanitizer CI
    jobs (-fsanitize=thread / address,undefined) for race/UB detection."""
    import concurrent.futures

    from trico_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(99)
    planes = [rng.integers(0, 2**32, 20000, dtype=np.uint64).astype(np.uint32)
              for _ in range(4)]
    lz_planes = [rng.integers(0, 50, 70000, dtype=np.uint64).astype(np.uint8)
                 for _ in range(4)]
    exps = [(4, 10), (2, 8)]

    def job(i):
        if i % 2 == 0:
            return tuple(native.fp_encode_jobs([planes[i % 4]], exps))
        return tuple(native.lz4_compress_blocks(lz_planes[i % 4], 8192))

    serial = [job(i) for i in range(8)]
    for _ in range(3):
        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            got = list(ex.map(job, range(8)))
        assert got == serial


@pytest.mark.parametrize("dt", [np.uint32, np.uint64])
def test_bp_blocks_roundtrip_native(dt):
    """BP32/64 native batch codec round-trip (sanitizer-covered surface)."""
    from trico_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(17)
    v = rng.integers(0, 2 ** (dt().itemsize * 8 - 1), 33333,
                     dtype=np.uint64).astype(dt)
    chunks = native.bp_encode_blocks(v, 8192)
    sizes = np.array([len(c) for c in chunks], np.int64)
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    cnts = np.minimum(8192, len(v) - np.arange(len(chunks)) * 8192)
    out = native.bp_decode_blocks(b"".join(chunks), offs, sizes, cnts,
                                  dt().itemsize)
    np.testing.assert_array_equal(out, v)
    # corrupt width byte must error, not crash
    bad = bytearray(chunks[0])
    bad[1] = 200
    with pytest.raises(ValueError):
        native.bp_decode_blocks(bytes(bad), [0], [len(bad)], [8192],
                                dt().itemsize)


def test_rows_bytes_moves_native():
    """tt_rows_to_bytes / tt_bytes_to_rows vs the NumPy mask formulation."""
    from trico_tpu import chunked, native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(23)
    C, B = 137, 4093
    mat = rng.integers(0, 255, (C, B), dtype=np.uint64).astype(np.uint8)
    sizes = rng.integers(0, B + 1, C).astype(np.int64)
    out = chunked.rows_to_bytes(mat, sizes)
    mask = np.arange(B)[None, :] < sizes[:, None]
    np.testing.assert_array_equal(out, mat[mask])
    back = chunked.bytes_to_rows(out, sizes, B)
    want = np.zeros((C, B), np.uint8)
    want[mask] = out
    np.testing.assert_array_equal(back, want)


@pytest.mark.skipif(not native.available(), reason="no native")
def test_lz4_partition_seam_rescan():
    """Highly repetitive long-period data must not pay partition-seam bytes:
    the encoder redoes a single serial scan when the partitioned result
    signals such data and keeps the smaller output (corpus 'scan' class
    regression — seams cost +29% on triangle-index byte planes before r5)."""
    from trico_tpu.codec import lz4_ref

    rng = np.random.default_rng(0)
    period = rng.integers(0, 4, 1314).astype(np.uint8)  # long-period pattern
    buf = np.tile(period, 260)  # ~342 KB -> 3 partitions
    a = native.lz4_compress(buf)
    b = lz4_ref.compress(bytes(buf))  # single-scan scalar oracle
    assert len(a) <= len(b)
    assert bytes(lz4_ref.decompress(a, len(buf))) == bytes(buf)
