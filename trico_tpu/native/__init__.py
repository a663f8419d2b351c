"""Native (C++) host runtime for trico-tpu.

Builds ``codec.cpp`` on demand with g++ (cached by source hash) and exposes it
via ctypes. This is the fast host path: scalar FP codec for reference-compatible
single-stream archives, an LZ4-block codec, and byte-plane shuffles. If the
toolchain is unavailable, callers fall back to the NumPy implementations.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "codec.cpp"
_LOCK = threading.Lock()
_LIB = None
_LOAD_ERROR: str | None = None


def _build_dir() -> Path:
    d = Path(os.environ.get("TRICO_TPU_BUILD_DIR", _HERE.parent.parent / "build"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _compile() -> Path:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _build_dir() / f"libtrico_native_{tag}.so"
    if out.exists():
        return out
    tmp = out.with_suffix(".so.tmp")
    cmd = [
        "g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC",
        "-std=c++17", "-fvisibility=hidden", str(_SRC), "-o", str(tmp),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, out)
    return out


def get_lib():
    """Return the loaded native library, or None if unavailable."""
    global _LIB, _LOAD_ERROR
    if _LIB is not None or _LOAD_ERROR is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LOAD_ERROR is not None:
            return _LIB
        try:
            lib = ctypes.CDLL(str(_compile()))
        except Exception as e:  # pragma: no cover - toolchain missing
            _LOAD_ERROR = str(e)
            return None
        i64, u32, u64 = ctypes.c_int64, ctypes.c_uint32, ctypes.c_uint64
        p = ctypes.c_void_p
        lib.tt_fp32_encode.restype = i64
        lib.tt_fp32_encode.argtypes = [p, u32, u32, u32, p, i64]
        lib.tt_fp64_encode.restype = i64
        lib.tt_fp64_encode.argtypes = [p, u32, u32, u32, p, i64]
        lib.tt_fp32_decode.restype = i64
        lib.tt_fp32_decode.argtypes = [p, i64, p, u32, ctypes.POINTER(u32)]
        lib.tt_fp64_decode.restype = i64
        lib.tt_fp64_decode.argtypes = [p, i64, p, u32, ctypes.POINTER(u32)]
        lib.tt_lz4_bound.restype = i64
        lib.tt_lz4_bound.argtypes = [i64]
        lib.tt_lz4_compress.restype = i64
        lib.tt_lz4_compress.argtypes = [p, i64, p, i64]
        lib.tt_lz4_decompress.restype = i64
        lib.tt_lz4_decompress.argtypes = [p, i64, p, i64]
        lib.tt_lz4_decompress_blocks.restype = i64
        lib.tt_lz4_decompress_blocks.argtypes = [p, p, p, i64, p, p, p]
        lib.tt_lz4_compress_blocks.restype = i64
        lib.tt_lz4_compress_blocks.argtypes = [p, p, p, i64, p, i64, p]
        lib.tt_fp32_decode_blocks.restype = i64
        lib.tt_fp32_decode_blocks.argtypes = [p, p, p, i64, p, p, p]
        lib.tt_fp64_decode_blocks.restype = i64
        lib.tt_fp64_decode_blocks.argtypes = [p, p, p, i64, p, p, p]
        lib.tt_lz4_emit.restype = i64
        lib.tt_lz4_emit.argtypes = [p, i64, p, p, p, i64]
        lib.tt_fp32_pack_chunks.restype = i64
        lib.tt_fp32_pack_chunks.argtypes = [p, p, i64, i64, u32, u32, p, i64, p]
        lib.tt_fp32_parse_chunks.restype = i64
        lib.tt_fp32_parse_chunks.argtypes = [p, i64, i64, i64, p, p]
        lib.tt_fp64_pack_chunks.restype = i64
        lib.tt_fp64_pack_chunks.argtypes = [p, p, i64, i64, u32, u32, p, i64, p]
        lib.tt_fp64_parse_chunks.restype = i64
        lib.tt_fp64_parse_chunks.argtypes = [p, i64, i64, i64, p, p]
        lib.tt_fp32_relayout_chunks.restype = i64
        lib.tt_fp32_relayout_chunks.argtypes = [p, i64, i64, i64, ctypes.c_int32, p]
        lib.tt_fp64_relayout_chunks.restype = i64
        lib.tt_fp64_relayout_chunks.argtypes = [p, i64, i64, i64, ctypes.c_int32, p]
        lib.tt_shuffle_bytes.restype = None
        lib.tt_shuffle_bytes.argtypes = [p, i64, ctypes.c_int32, p]
        lib.tt_unshuffle_bytes.restype = None
        lib.tt_unshuffle_bytes.argtypes = [p, i64, ctypes.c_int32, p]
        _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def fp_encode(values: np.ndarray, e1: int, e2: int) -> bytes:
    """Native FP substream encode. values: uint32 or uint64 (raw float bits)."""
    lib = get_lib()
    values = np.ascontiguousarray(values)
    n = len(values)
    if values.dtype == np.uint32:
        cap = 5 + 3 * ((n + 7) // 8) + 4 * n + 8
        out = np.empty(cap, dtype=np.uint8)
        sz = lib.tt_fp32_encode(_ptr(values), n, e1, e2, _ptr(out), cap)
    elif values.dtype == np.uint64:
        cap = 5 + ((n + 1) // 2) + 8 * n + 8
        out = np.empty(cap, dtype=np.uint8)
        sz = lib.tt_fp64_encode(_ptr(values), n, e1, e2, _ptr(out), cap)
    else:
        raise TypeError(values.dtype)
    if sz < 0:
        raise RuntimeError(f"native fp encode failed: {sz}")
    return out[:sz].tobytes()


def fp_decode(data, bits: int) -> np.ndarray:
    """Native FP substream decode → uint32/uint64 raw-bits array."""
    lib = get_lib()
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    buf = np.ascontiguousarray(buf)
    if len(buf) < 5:
        raise ValueError("truncated FP substream")
    n = int.from_bytes(buf[1:5].tobytes(), "big")
    n_out = ctypes.c_uint32(0)
    if bits == 32:
        out = np.empty(n, dtype=np.uint32)
        rc = lib.tt_fp32_decode(_ptr(buf), len(buf), _ptr(out), n, ctypes.byref(n_out))
    else:
        out = np.empty(n, dtype=np.uint64)
        rc = lib.tt_fp64_decode(_ptr(buf), len(buf), _ptr(out), n, ctypes.byref(n_out))
    if rc < 0:
        raise ValueError(f"corrupt FP substream (rc={rc})")
    return out


def relayout_chunks(mat: np.ndarray, L: int, bits: int, to_v2: bool) -> np.ndarray:
    """Batch v1<->v2 chunk relayout of a padded (C, B) payload matrix.

    Pure byte permutation per chunk (multithreaded native walk); the returned
    matrix has identical per-chunk sizes."""
    lib = get_lib()
    mat = np.ascontiguousarray(mat)
    C, B = mat.shape
    out = np.zeros_like(mat)
    fn = lib.tt_fp32_relayout_chunks if bits == 32 else lib.tt_fp64_relayout_chunks
    rc = fn(_ptr(mat), C, B, L, 1 if to_v2 else 0, _ptr(out))
    if rc != 0:
        raise RuntimeError("native relayout failed")
    return out


def lz4_compress(data) -> bytes:
    lib = get_lib()
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else np.ascontiguousarray(data)
    cap = int(lib.tt_lz4_bound(len(buf)))
    out = np.empty(cap, dtype=np.uint8)
    sz = lib.tt_lz4_compress(_ptr(buf), len(buf), _ptr(out), cap)
    if sz < 0:
        raise RuntimeError("lz4 compress failed")
    return out[:sz].tobytes()


def lz4_compress_blocks(plane: np.ndarray, block_len: int) -> list[bytes]:
    """Compress ``plane`` as independent ``block_len``-byte LZ4 blocks in
    parallel (hardware threads). Returns one bytes object per block."""
    lib = get_lib()
    plane = np.ascontiguousarray(plane, np.uint8).reshape(-1)
    n = len(plane)
    n_blocks = max((n + block_len - 1) // block_len, 1)
    src_off = (np.arange(n_blocks, dtype=np.int64) * block_len)
    src_sz = np.minimum(block_len, n - src_off)
    cap = int(lib.tt_lz4_bound(min(block_len, n)))
    dst = np.empty(n_blocks * cap, np.uint8)
    out_sz = np.zeros(n_blocks, np.int64)
    rc = lib.tt_lz4_compress_blocks(
        _ptr(plane), _ptr(src_off), _ptr(src_sz), n_blocks,
        _ptr(dst), cap, _ptr(out_sz),
    )
    if rc != 0:
        raise RuntimeError(f"lz4 block compress failed at block {-rc - 1}")
    return [dst[i * cap : i * cap + out_sz[i]].tobytes() for i in range(n_blocks)]


def fp_decode_blocks(data, src_offsets: np.ndarray, src_sizes: np.ndarray,
                     dst_counts: np.ndarray, bits: int) -> np.ndarray:
    """Decode independent FP substream chunks in parallel (hardware threads).

    ``data`` holds concatenated chunk payloads; chunk i spans
    ``src_offsets[i] : src_offsets[i] + src_sizes[i]`` and decodes to exactly
    ``dst_counts[i]`` values. Returns the concatenated raw-bits array."""
    lib = get_lib()
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) \
        else np.ascontiguousarray(data)
    src_off = np.ascontiguousarray(src_offsets, np.int64)
    src_sz = np.ascontiguousarray(src_sizes, np.int64)
    dst_n = np.ascontiguousarray(dst_counts, np.int64)
    dst_off = np.concatenate([[0], np.cumsum(dst_n)[:-1]]).astype(np.int64)
    out = np.empty(int(dst_n.sum()), np.uint32 if bits == 32 else np.uint64)
    fn = lib.tt_fp32_decode_blocks if bits == 32 else lib.tt_fp64_decode_blocks
    rc = fn(_ptr(buf), _ptr(src_off), _ptr(src_sz), len(src_sz),
            _ptr(out), _ptr(dst_off), _ptr(dst_n))
    if rc != 0:
        raise ValueError(f"corrupt FP chunk {-rc - 1}")
    return out


def lz4_decompress_blocks(data, src_offsets: np.ndarray, src_sizes: np.ndarray,
                          dst_sizes: np.ndarray) -> np.ndarray:
    """Decode independent LZ4 blocks in parallel (hardware threads).

    ``data`` holds the concatenated compressed blocks; block i spans
    ``src_offsets[i] : src_offsets[i] + src_sizes[i]``. Returns the
    concatenated plain bytes (block i decodes to exactly ``dst_sizes[i]``)."""
    lib = get_lib()
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) \
        else np.ascontiguousarray(data)
    src_off = np.ascontiguousarray(src_offsets, np.int64)
    src_sz = np.ascontiguousarray(src_sizes, np.int64)
    dst_sz = np.ascontiguousarray(dst_sizes, np.int64)
    dst_off = np.concatenate([[0], np.cumsum(dst_sz)[:-1]]).astype(np.int64)
    out = np.empty(int(dst_sz.sum()), np.uint8)
    rc = lib.tt_lz4_decompress_blocks(
        _ptr(buf), _ptr(src_off), _ptr(src_sz), len(src_sz),
        _ptr(out), _ptr(dst_off), _ptr(dst_sz),
    )
    if rc != 0:
        raise ValueError(f"corrupt LZ4 block {-rc - 1}")
    return out


def lz4_decompress(data, out_size: int) -> np.ndarray:
    lib = get_lib()
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else np.ascontiguousarray(data)
    out = np.empty(out_size, dtype=np.uint8)
    sz = lib.tt_lz4_decompress(_ptr(buf), len(buf), _ptr(out), out_size)
    if sz != out_size:
        raise ValueError(f"corrupt LZ4 block (got {sz}, want {out_size})")
    return out
