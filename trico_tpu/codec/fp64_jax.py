"""TPU chunk-parallel FCM/DFCM codec for 64-bit (double-precision) streams.

TPUs have no native 64-bit integer path, so values are carried as (hi, lo)
uint32 pairs through the same lane-parallel scan as the f32 kernel
(fp_jax.py): chunks on the lane axis, hash tables as (C, T) pairs updated by
one-hot compare/select, add/sub with explicit borrow/carry, shifts by
``64 - e >= 34`` reading only the hi word. Group = 2 values, 1 tag byte of two
4-bit bcodes (reference fps.c:421-561; format notes in fp_ref.py).

Byte packing/parsing is host-side (native ``tt_fp64_pack_chunks`` /
``tt_fp64_parse_chunks``); every chunk payload is a standard reference f64
substream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fp_jax import _SCAN_UNROLL, _onehot_read, _onehot_write, _pad_rows


def _norm_exponents(e1: int, e2: int) -> tuple[int, int]:
    return min((e1 >> 1) << 1, 30), min((e2 >> 1) << 1, 30)


def f64_max_chunk_bytes(L: int) -> int:
    assert L % 2 == 0
    return 5 + (L // 2) + 8 * L


def _sub64(ahi, alo, bhi, blo):
    lo = alo - blo
    borrow = (alo < blo).astype(jnp.uint32)
    return ahi - bhi - borrow, lo


def _add64(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    return ahi + bhi + carry, lo


@functools.partial(jax.jit, static_argnums=(2, 3))
def predict_f64_chunks(hi: jax.Array, lo: jax.Array, e1: int = 20, e2: int = 20):
    """(C, L) uint32 hi/lo words → (bcode (C, L) uint8, res hi/lo (C, L))."""
    e1, e2 = _norm_exponents(e1, e2)
    C, L = hi.shape
    T1, T2 = 1 << e1, 1 << e2
    m2 = np.uint32((1 << e2) - 1)
    iota1 = jnp.arange(T1, dtype=jnp.uint32)[None, :]
    iota2 = jnp.arange(T2, dtype=jnp.uint32)[None, :]

    def step(carry, v):
        (t1h, t1l, t2h, t2l, h1, h2, p1h, p1l, p2h, p2l, lh, ll) = carry
        vh, vl = v
        x1h, x1l = vh ^ p1h, vl ^ p1l
        d2h, d2l = _add64(lh, ll, p2h, p2l)
        x2h, x2l = vh ^ d2h, vl ^ d2l
        t1h = _onehot_write(t1h, h1, vh, iota1)
        t1l = _onehot_write(t1l, h1, vl, iota1)
        # hash1 = top e1 bits of v  (closed form; shift 64-e1 >= 34 → hi only)
        h1n = vh >> (64 - e1 - 32) if e1 else h1
        p1h = _onehot_read(t1h, h1n, iota1)
        p1l = _onehot_read(t1l, h1n, iota1)
        sh, sl = _sub64(vh, vl, lh, ll)
        t2h = _onehot_write(t2h, h2, sh, iota2)
        t2l = _onehot_write(t2l, h2, sl, iota2)
        if e2:
            top = sh >> (64 - e2 - 32)  # stride >> (64-e2), hi word only
            h2n = ((h2 << (e2 // 2)) ^ top) & m2
        else:
            h2n = h2
        p2h = _onehot_read(t2h, h2n, iota2)
        p2l = _onehot_read(t2l, h2n, iota2)
        return (t1h, t1l, t2h, t2l, h1n, h2n, p1h, p1l, p2h, p2l, vh, vl), (
            x1h, x1l, x2h, x2l,
        )

    z = jnp.zeros((C,), jnp.uint32)
    zt1 = jnp.zeros((C, T1), jnp.uint32)
    zt2 = jnp.zeros((C, T2), jnp.uint32)
    carry0 = (zt1, zt1, zt2, zt2, z, z, z, z, z, z, z, z)
    _, (x1hT, x1lT, x2hT, x2lT) = jax.lax.scan(
        step, carry0, (hi.T, lo.T), unroll=_SCAN_UNROLL
    )
    x1h, x1l, x2h, x2l = x1hT.T, x1lT.T, x2hT.T, x2lT.T

    def nbytes(xh, xl, lo_bound):
        # number of significant bytes of the 64-bit value (hi, lo)
        nlo = jnp.where(
            xl == 0, 0,
            jnp.where(xl >> 8 == 0, 1,
                      jnp.where(xl >> 16 == 0, 2, jnp.where(xl >> 24 == 0, 3, 4))),
        )
        nhi = jnp.where(
            xh == 0, 0,
            jnp.where(xh >> 8 == 0, 1,
                      jnp.where(xh >> 16 == 0, 2, jnp.where(xh >> 24 == 0, 3, 4))),
        )
        n = jnp.where(xh == 0, nlo, 4 + nhi)
        return jnp.maximum(n, lo_bound).astype(jnp.int32)

    nb1 = nbytes(x1h, x1l, 0)
    nb2 = nbytes(x2h, x2l, 1)  # DFCM zero residual still stores one byte
    use_dfcm = (nb1 >= 2) & (nb2 < nb1) & (nb2 <= 7)
    bcode = jnp.where(use_dfcm, 8 + nb2, nb1)
    rh = jnp.where(use_dfcm, x2h, x1h)
    rl = jnp.where(use_dfcm, x2l, x1l)
    return bcode.astype(jnp.uint8), rh, rl


@functools.partial(jax.jit, static_argnums=(3, 4))
def replay_f64_chunks(bcodes: jax.Array, xhi: jax.Array, xlo: jax.Array,
                      e1: int = 20, e2: int = 20):
    """Decode replay: parsed (C, L) (bcode, xor hi/lo) → value hi/lo words."""
    e1, e2 = _norm_exponents(e1, e2)
    C, L = xhi.shape
    T1, T2 = 1 << e1, 1 << e2
    m2 = np.uint32((1 << e2) - 1)
    iota1 = jnp.arange(T1, dtype=jnp.uint32)[None, :]
    iota2 = jnp.arange(T2, dtype=jnp.uint32)[None, :]

    def step(carry, inp):
        (t1h, t1l, t2h, t2l, h1, h2, p1h, p1l, p2h, p2l, lh, ll) = carry
        xh, xl, bc = inp
        d2h, d2l = _add64(lh, ll, p2h, p2l)
        ph = jnp.where(bc > 8, d2h, p1h)
        pl = jnp.where(bc > 8, d2l, p1l)
        vh, vl = xh ^ ph, xl ^ pl
        t1h = _onehot_write(t1h, h1, vh, iota1)
        t1l = _onehot_write(t1l, h1, vl, iota1)
        h1n = vh >> (64 - e1 - 32) if e1 else h1
        p1h = _onehot_read(t1h, h1n, iota1)
        p1l = _onehot_read(t1l, h1n, iota1)
        sh, sl = _sub64(vh, vl, lh, ll)
        t2h = _onehot_write(t2h, h2, sh, iota2)
        t2l = _onehot_write(t2l, h2, sl, iota2)
        if e2:
            h2n = ((h2 << (e2 // 2)) ^ (sh >> (64 - e2 - 32))) & m2
        else:
            h2n = h2
        p2h = _onehot_read(t2h, h2n, iota2)
        p2l = _onehot_read(t2l, h2n, iota2)
        return (t1h, t1l, t2h, t2l, h1n, h2n, p1h, p1l, p2h, p2l, vh, vl), (vh, vl)

    z = jnp.zeros((C,), jnp.uint32)
    zt1 = jnp.zeros((C, T1), jnp.uint32)
    zt2 = jnp.zeros((C, T2), jnp.uint32)
    carry0 = (zt1, zt1, zt2, zt2, z, z, z, z, z, z, z, z)
    _, (vhT, vlT) = jax.lax.scan(
        step, carry0,
        (xhi.T, xlo.T, bcodes.astype(jnp.uint32).T),
        unroll=_SCAN_UNROLL,
    )
    return vhT.T, vlT.T


# ---------------------------------------------------------------------------
# numpy-facing wrappers
# ---------------------------------------------------------------------------


def _split_words(values_u64: np.ndarray):
    lo = (values_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (values_u64 >> np.uint64(32)).astype(np.uint32)
    return hi, lo


def encode_f64(values_u64: np.ndarray, chunk_len: int, e1: int = 20, e2: int = 20):
    """Encode a flat uint64 stream in TPU chunks (device predict + native pack).

    Returns (payloads (C, B) uint8, sizes (C,) int64, tail_values).
    """
    import ctypes

    from .. import native

    e1, e2 = _norm_exponents(e1, e2)
    chunk_len = (chunk_len // 2) * 2 or 2
    n = len(values_u64)
    C = n // chunk_len
    tail = values_u64[C * chunk_len:]
    B = f64_max_chunk_bytes(chunk_len)
    if C == 0:
        return np.zeros((0, B), np.uint8), np.zeros(0, np.int64), tail
    hi, lo = _split_words(values_u64[: C * chunk_len])
    hi = _pad_rows(hi.reshape(C, chunk_len), C)
    lo = _pad_rows(lo.reshape(C, chunk_len), C)
    bcode, rh, rl = predict_f64_chunks(jnp.asarray(hi), jnp.asarray(lo), e1, e2)
    bc_np = np.ascontiguousarray(np.asarray(bcode)[:C])
    rh_np = np.ascontiguousarray(np.asarray(rh)[:C])
    rl_np = np.ascontiguousarray(np.asarray(rl)[:C])
    res = (rh_np.astype(np.uint64) << np.uint64(32)) | rl_np.astype(np.uint64)
    lib = native.get_lib()
    if lib is None:
        # pure-python fallback: pack via the oracle formatter chunk by chunk
        raise RuntimeError("native library required for f64 chunk packing")
    out = np.zeros((C, B), dtype=np.uint8)
    sizes = np.zeros(C, dtype=np.int32)
    rc = lib.tt_fp64_pack_chunks(
        bc_np.ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(res).ctypes.data_as(ctypes.c_void_p),
        C, chunk_len, e1, e2,
        out.ctypes.data_as(ctypes.c_void_p), B,
        sizes.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise RuntimeError("native f64 pack failed")
    return out, sizes.astype(np.int64), tail


def decode_f64(payloads: np.ndarray, chunk_len: int, e1: int = 20, e2: int = 20) -> np.ndarray:
    """Decode (C, B) padded f64 chunk payloads → flat uint64 values."""
    import ctypes

    from .. import native

    e1, e2 = _norm_exponents(e1, e2)
    C, B = payloads.shape
    if C == 0:
        return np.zeros(0, np.uint64)
    lib = native.get_lib()
    payloads = np.ascontiguousarray(payloads)
    bcodes = np.zeros((C, chunk_len), np.uint8)
    xors = np.zeros((C, chunk_len), np.uint64)
    rc = lib.tt_fp64_parse_chunks(
        payloads.ctypes.data_as(ctypes.c_void_p), C, B, chunk_len,
        bcodes.ctypes.data_as(ctypes.c_void_p),
        xors.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise RuntimeError("native f64 parse failed")
    xh, xl = _split_words(xors)
    vh, vl = replay_f64_chunks(
        jnp.asarray(_pad_rows(bcodes, C)),
        jnp.asarray(_pad_rows(xh, C)),
        jnp.asarray(_pad_rows(xl, C)),
        e1, e2,
    )
    vh = np.asarray(vh)[:C].astype(np.uint64)
    vl = np.asarray(vl)[:C].astype(np.uint64)
    return ((vh << np.uint64(32)) | vl).reshape(-1)
