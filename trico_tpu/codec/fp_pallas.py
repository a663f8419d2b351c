"""Pallas TPU kernels for the FCM/DFCM predictor scan.

Same math as the ``lax.scan`` path in fp_jax.py, but with the hash tables
pinned in VMEM scratch for the whole block and the position loop as an
in-kernel ``fori_loop`` — no per-step HBM carry traffic and no scan overhead.

Layout: chunks ride the 128-wide lane axis; tables are (T, CB) with the
table index on sublanes, so one-hot reads/writes are full-width VPU
compare/selects. The grid walks chunk blocks of _c_blk(L, T1, T2) lanes (VMEM-budgeted).

Used automatically by fp_jax.encode when running on a real TPU backend (falls
back to the XLA scan elsewhere; interpret mode keeps tests exact on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_BLK = 512


def _c_blk(L: int, T1: int, T2: int) -> int:
    """Lane-block width that fits the scoped VMEM budget.

    Per grid step the kernel holds 3 (L, C) u32 streams (double-buffered
    across grid steps by the pipeline) plus the two (T, C) hash tables, so
    the footprint is (2*3*L + T1 + T2) * C * 4 bytes against the ~16 MiB
    scoped VMEM limit. 512 lanes fits L=1024 (the historical default); wider
    chunks shrink the block in power-of-two steps, floored at one lane tile.
    """
    budget = 14 * 1024 * 1024
    c = C_BLK
    while c > 128 and (6 * L + T1 + T2) * c * 4 > budget:
        c //= 2
    return c


def _onehot_reduce(table, iota, idx):
    """table[idx] per lane via compare/select + reduce.

    Mosaic can't reduce unsigned ints; the one-hot select has exactly one
    non-zero per lane, so an int32 bitcast + sum is exact.
    """
    sel = jnp.where(iota == idx, table, 0)
    s = jnp.sum(jax.lax.bitcast_convert_type(sel, jnp.int32), axis=0, keepdims=True)
    return jax.lax.bitcast_convert_type(s, jnp.uint32)


def _norm_exponents(e1: int, e2: int) -> tuple[int, int]:
    return min((e1 >> 1) << 1, 30), min((e2 >> 1) << 1, 30)


def _predict_kernel(e1, e2, T1, T2, L, CB, in_ref, xor1_ref, xor2_ref, t1_ref, t2_ref):
    m2 = np.uint32((1 << e2) - 1)
    iota1 = jax.lax.broadcasted_iota(jnp.uint32, (T1, CB), 0)
    iota2 = jax.lax.broadcasted_iota(jnp.uint32, (T2, CB), 0)
    t1_ref[:] = jnp.zeros((T1, CB), jnp.uint32)
    t2_ref[:] = jnp.zeros((T2, CB), jnp.uint32)

    z = jnp.zeros((1, CB), jnp.uint32)

    def body(i, carry):
        h1, h2, pred1, pred2, last = carry
        v = in_ref[i, :].reshape(1, CB)
        xor1_ref[i, :] = (v ^ pred1).reshape(CB)
        xor2_ref[i, :] = (v ^ (last + pred2)).reshape(CB)
        t1_ref[:] = jnp.where(iota1 == h1, v, t1_ref[:])
        h1n = (v >> (32 - e1)) if e1 else h1
        pred1 = _onehot_reduce(t1_ref[:], iota1, h1n)
        stride = v - last
        t2_ref[:] = jnp.where(iota2 == h2, stride, t2_ref[:])
        h2n = (((h2 << (e2 // 2)) ^ (stride >> (32 - e2))) & m2) if e2 else h2
        pred2 = _onehot_reduce(t2_ref[:], iota2, h2n)
        return (h1n, h2n, pred1, pred2, v)

    jax.lax.fori_loop(0, L, body, (z, z, z, z, z))


def _predict_window_kernel(e1, e2, T1, T2, L, K, CB,
                           in_ref, xor1_ref, xor2_ref, t1_ref, t2_ref):
    """Windowed encode predictor: K positions per loop step, bit-exact.

    Encode (unlike decode replay) has no value->prediction dependency chain:
    both hash-key sequences are closed forms of the *inputs* —
    ``k1_i = v_{i-1} >> (32-e1)`` (the ``(h1 << e1) & m1`` term is always 0)
    and ``k2_i = t_{i-1} ^ ((t_{i-2} << e2/2) & m2)`` with
    ``t = stride >> (32-e2)`` (the ``h2 << e2`` term masks away) — reference
    fps.c:76-84; the same identities behind fp_jax._predict_sort. Only the
    tables are sequential state, and a table read at position i equals
    "latest j < i with key_j == key_i" — so a whole K-window resolves with:

    * K stale-table one-hot reads (the table as of the window start),
    * K(K-1)/2 pairwise in-window overrides (later writer wins), and
    * K table writes applied once, after the window's reads.

    Same op count as the 1-position scan but the reads/overrides are
    *independent* — the serial reduce-latency chain per position becomes one
    per window (VERDICT r4 #5: 5.9 -> beyond; measured on v5e in
    scripts/tpu_predict_modes.py).
    """
    m2 = np.uint32((1 << e2) - 1)
    sh2 = e2 // 2
    iota1 = jax.lax.broadcasted_iota(jnp.uint32, (T1, CB), 0)
    iota2 = jax.lax.broadcasted_iota(jnp.uint32, (T2, CB), 0)
    t1_ref[:] = jnp.zeros((T1, CB), jnp.uint32)
    t2_ref[:] = jnp.zeros((T2, CB), jnp.uint32)
    z = jnp.zeros((1, CB), jnp.uint32)

    def window(w, carry):
        vprev, tprev, tprev2 = carry
        base = w * K
        vs, k1s, strides, k2s = [], [], [], []
        for q in range(K):
            v = in_ref[base + q, :].reshape(1, CB)
            vp = vs[q - 1] if q else vprev
            vs.append(v)
            k1s.append(vp >> (32 - e1))
            s = v - vp
            strides.append(s)
            t_1 = (strides[q - 1] >> (32 - e2)) if q else tprev
            t_2 = ((strides[q - 2] >> (32 - e2)) if q >= 2
                   else (tprev if q == 1 else tprev2))
            k2s.append(t_1 ^ ((t_2 << sh2) & m2))
        for q in range(K):
            # stale read, then in-window overrides (ascending j: last wins)
            pred1 = _onehot_reduce(t1_ref[:], iota1, k1s[q])
            pred2 = _onehot_reduce(t2_ref[:], iota2, k2s[q])
            for j in range(q):
                pred1 = jnp.where(k1s[j] == k1s[q], vs[j], pred1)
                pred2 = jnp.where(k2s[j] == k2s[q], strides[j], pred2)
            vp = vs[q - 1] if q else vprev
            xor1_ref[base + q, :] = (vs[q] ^ pred1).reshape(CB)
            xor2_ref[base + q, :] = (vs[q] ^ (vp + pred2)).reshape(CB)
        for q in range(K):
            t1_ref[:] = jnp.where(iota1 == k1s[q], vs[q], t1_ref[:])
            t2_ref[:] = jnp.where(iota2 == k2s[q], strides[q], t2_ref[:])
        tl = strides[K - 1] >> (32 - e2)
        tl2 = (strides[K - 2] >> (32 - e2)) if K >= 2 else tprev
        return (vs[K - 1], tl, tl2)

    jax.lax.fori_loop(0, L // K, window, (z, z, z))


def _fcm_multi_kernel(e1s, L, CB, in_ref, *refs):
    """FCM-only predictor scan for several exponents in one pass.

    The FCM tables are tiny (2^e1 ≤ 64 rows for the adaptive candidate set),
    so evaluating K exponents costs barely more than one DFCM pass — this is
    what makes exact per-chunk adaptive exponent search cheap (VERDICT r2 #1).
    refs = K xor outputs then K table scratches.
    """
    K = len(e1s)
    xor_refs, t_refs = refs[:K], refs[K:]
    iotas = [jax.lax.broadcasted_iota(jnp.uint32, (1 << e, CB), 0) for e in e1s]
    for k in range(K):
        t_refs[k][:] = jnp.zeros((1 << e1s[k], CB), jnp.uint32)
    z = jnp.zeros((1, CB), jnp.uint32)

    def body(i, carry):
        preds, hs = carry
        v = in_ref[i, :].reshape(1, CB)
        new_preds, new_hs = [], []
        for k, e in enumerate(e1s):
            xor_refs[k][i, :] = (v ^ preds[k]).reshape(CB)
            # write at the pre-update hash, then update and read (fps.c:76-79,
            # 133-136: table store precedes the hash update)
            t_refs[k][:] = jnp.where(iotas[k] == hs[k], v, t_refs[k][:])
            hn = v >> (32 - e)
            new_preds.append(_onehot_reduce(t_refs[k][:], iotas[k], hn))
            new_hs.append(hn)
        return tuple(new_preds), tuple(new_hs)

    jax.lax.fori_loop(
        0, L, body,
        (tuple(z for _ in range(K)), tuple(z for _ in range(K))))


@functools.partial(jax.jit, static_argnums=(1, 2))
def predict_fcm_xors_pallas(values: jax.Array, e1s: tuple, interpret: bool = False):
    """(C, L) uint32 chunks → tuple of FCM xor1 arrays, one per exponent in
    ``e1s`` (each e1 ≥ 2; e1 = 0 degenerates to v ^ vprev — compute in XLA)."""
    C, L = values.shape
    K = len(e1s)
    Tsum = sum(1 << e for e in e1s)
    budget = 14 * 1024 * 1024
    CB = C_BLK
    while CB > 128 and (2 * (1 + K) * L + Tsum) * CB * 4 > budget:
        CB //= 2
    vT, Cp = _pad_lanes(values.T, CB)
    kern = functools.partial(_fcm_multi_kernel, e1s, L, CB)
    outs = pl.pallas_call(
        kern,
        grid=(Cp // CB,),
        in_specs=[pl.BlockSpec((L, CB), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((L, CB), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(K)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Cp), jnp.uint32) for _ in range(K)
        ],
        scratch_shapes=[
            pltpu.VMEM((1 << e, CB), jnp.uint32) for e in e1s
        ],
        interpret=interpret,
    )(vT)
    return tuple(o[:, :C].T for o in outs)


def _replay_kernel(e1, e2, T1, T2, L, CB, fcm_max, xor_ref, bc_ref, out_ref, t1_ref, t2_ref):
    m2 = np.uint32((1 << e2) - 1)
    iota1 = jax.lax.broadcasted_iota(jnp.uint32, (T1, CB), 0)
    iota2 = jax.lax.broadcasted_iota(jnp.uint32, (T2, CB), 0)
    t1_ref[:] = jnp.zeros((T1, CB), jnp.uint32)
    t2_ref[:] = jnp.zeros((T2, CB), jnp.uint32)

    z = jnp.zeros((1, CB), jnp.uint32)

    def body(i, carry):
        h1, h2, pred1, pred2, last = carry
        xor = xor_ref[i, :].reshape(1, CB)
        bc = bc_ref[i, :].reshape(1, CB)
        pred = jnp.where(bc > fcm_max, last + pred2, pred1)
        v = xor ^ pred
        out_ref[i, :] = v.reshape(CB)
        t1_ref[:] = jnp.where(iota1 == h1, v, t1_ref[:])
        h1n = (v >> (32 - e1)) if e1 else h1
        pred1 = _onehot_reduce(t1_ref[:], iota1, h1n)
        stride = v - last
        t2_ref[:] = jnp.where(iota2 == h2, stride, t2_ref[:])
        h2n = (((h2 << (e2 // 2)) ^ (stride >> (32 - e2))) & m2) if e2 else h2
        pred2 = _onehot_reduce(t2_ref[:], iota2, h2n)
        return (h1n, h2n, pred1, pred2, v)

    jax.lax.fori_loop(0, L, body, (z, z, z, z, z))


# ---------------------------------------------------------------------------
# monotone log-shift data movement in VMEM
#
# The XLA formulation (fp_jax._logshift_passes) materializes every pass in
# HBM: ~2 * nbits array traversals (measured 5 GB/s for pack/parse at
# L=4096). Here the whole network runs on a (R_SUB, S) VMEM tile per grid
# step, so HBM sees each byte once in and once out. Semantics identical to
# fp_jax._compact_monotone / _expand_monotone (same packed-word encoding).
# ---------------------------------------------------------------------------

import os as _os

# rows per grid step: 16 measured best on v5e (5.6 GB/s parse vs 4.7 at 8)
_R_SUB = int(_os.environ.get("TRICO_TPU_LOGSHIFT_ROWS", "16"))


def _rows_for(S: int, n_tiles: int = 4) -> int:
    """Row-block that keeps a network's double-buffered (R, S) u32 tiles
    inside scoped VMEM: ``n_tiles`` x R x S x 4 B <= 14 MiB, where n_tiles
    counts pipeline buffers = 2 x (inputs + outputs) — 4 for the log-shift
    (1 in, 1 out), 6 for the pair-compaction (2 in, 1 out). At the fp32
    production S=16384 and the f64/BP-8192 S=32768 this returns _R_SUB
    unchanged; BP32's S=65536 (chunk_len 16384, 4L slots) previously blew
    the 16 MiB limit at compile time on real TPUs (r5 — the path only ever
    ran on the limit-free CPU backend before)."""
    R = _R_SUB
    while R > 1 and n_tiles * R * S * 4 > 14 * 1024 * 1024:
        R //= 2
    return R


def _logshift_kernel(S, pb, direction, interpret, word_ref, out_ref):
    w = word_ref[:, :]
    R = w.shape[0]
    nbits = max(S - 1, 1).bit_length()
    rng = range(nbits) if direction == "left" else reversed(range(nbits))
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
    roll = jnp.roll if interpret else pltpu.roll
    for b in rng:
        d = 1 << b
        if direction == "left":
            # shift left by d, zero-filling the top d lanes
            cand = jnp.where(lane < S - d, roll(w, S - d, axis=1), 0)
        else:
            cand = jnp.where(lane >= d, roll(w, d, axis=1), 0)
        bit = jnp.uint32(d << pb)
        arrives = (cand & bit) != 0
        departs = (w & bit) != 0
        w = jnp.where(arrives, cand - bit, jnp.where(departs, 0, w))
    out_ref[:, :] = w & jnp.uint32((1 << pb) - 1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def logshift_pallas(word: jax.Array, pb: int, direction: str,
                    interpret: bool = False):
    """Run the monotone log-shift network over (C, S) packed words in VMEM.

    ``word`` rows are independent; encoding is ``shift << pb | payload`` with
    0 = dead slot, exactly as fp_jax._logshift_passes. Returns the payload
    (masked to pb bits) after movement. One HBM read + one write total,
    versus ~2*nbits traversals for the XLA formulation.
    """
    C, S = word.shape
    R = _rows_for(S)
    Cp = ((C + R - 1) // R) * R
    if Cp != C:
        word = jnp.pad(word, ((0, Cp - C), (0, 0)))
    kern = functools.partial(_logshift_kernel, S, pb, direction, interpret)
    out = pl.pallas_call(
        kern,
        grid=(Cp // R,),
        in_specs=[pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cp, S), jnp.uint32),
        interpret=interpret,
    )(word)
    return out[:C]


def _pair_compact_kernel(nbits, S, interpret, c_ref, p_ref, out_ref):
    """Merging monotone left-compaction over lanes (see pack_funnel).

    carrier = disp << 1 | 1 (0 dead); payload ORs on same-destination merge.
    Whole network runs on a (R, S) VMEM tile: one HBM read per array, one
    write, versus 2*nbits round trips for the XLA formulation.
    """
    c = c_ref[:, :]
    p = p_ref[:, :]
    R = c.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
    roll = jnp.roll if interpret else pltpu.roll
    for b in range(nbits):
        d = 1 << b
        keep = lane < S - d
        cand_c = jnp.where(keep, roll(c, S - d, axis=1), 0)
        cand_p = jnp.where(keep, roll(p, S - d, axis=1), 0)
        bit = jnp.uint32(d << 1)
        arrives = (cand_c & bit) != 0
        departs = (c & bit) != 0
        stays = ((c & 1) != 0) & ~departs
        c = jnp.where(arrives, cand_c - bit, jnp.where(departs, 0, c))
        p = jnp.where(arrives & stays, p | cand_p,
                      jnp.where(arrives, cand_p, jnp.where(departs, 0, p)))
    out_ref[:, :] = jnp.where(c == 1, p, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def pair_compact_or_pallas(carrier: jax.Array, payload: jax.Array, nbits: int,
                           interpret: bool = False):
    """VMEM merging compaction of (C, S) (carrier, payload) rows."""
    C, S = carrier.shape
    R = _rows_for(S, n_tiles=6)  # 2 inputs + 1 output, double-buffered
    Cp = ((C + R - 1) // R) * R
    if Cp != C:
        carrier = jnp.pad(carrier, ((0, Cp - C), (0, 0)))
        payload = jnp.pad(payload, ((0, Cp - C), (0, 0)))
    kern = functools.partial(_pair_compact_kernel, nbits, S, interpret)
    out = pl.pallas_call(
        kern,
        grid=(Cp // R,),
        in_specs=[
            pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cp, S), jnp.uint32),
        interpret=interpret,
    )(carrier, payload)
    return out[:C]


def _pad_lanes(values_T: jax.Array, CB: int = C_BLK):
    """(L, C) → (L, Cp) with Cp a multiple of the lane block."""
    L, C = values_T.shape
    Cp = ((C + CB - 1) // CB) * CB
    if Cp != C:
        values_T = jnp.pad(values_T, ((0, 0), (0, Cp - C)))
    return values_T, Cp


def _window_k(L: int) -> int:
    """Encode-predictor window size (positions per loop step). 0 disables
    the windowed kernel (falls back to the 1-position scan). K=4 measured
    best on v5e (predict pass 18.6 GB/s vs 13.6 for the 1-step scan at
    (4,6)/L=4096; K=8: 17.7, K=16: 16.5 — the O(K²) in-window override
    chain grows faster than the saved loop overhead). See PERF_NOTES.md."""
    k = int(_os.environ.get("TRICO_TPU_PALLAS_WINDOW", "4"))
    return k if k > 1 and L % k == 0 else 0


def predict_xors_pallas(values: jax.Array, e1: int, e2: int,
                        interpret: bool = False):
    """(C, L) uint32 chunks → (xor1, xor2) (C, L). Pallas predictor scan
    (windowed K-positions-per-step when e1, e2 > 0 — bit-identical).
    The window size is resolved OUTSIDE jit so the env override keys the
    compilation cache."""
    e1n, e2n = _norm_exponents(e1, e2)
    K = _window_k(values.shape[1]) if (e1n and e2n) else 0
    return _predict_xors_pallas_impl(values, e1, e2, interpret, K)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _predict_xors_pallas_impl(values: jax.Array, e1: int, e2: int,
                              interpret: bool, K: int):
    e1, e2 = _norm_exponents(e1, e2)
    C, L = values.shape
    T1, T2 = 1 << e1, 1 << e2
    CB = _c_blk(L, T1, T2)
    vT, Cp = _pad_lanes(values.T, CB)
    grid = (Cp // CB,)
    if K:
        kern = functools.partial(_predict_window_kernel, e1, e2, T1, T2, L,
                                 K, CB)
    else:
        kern = functools.partial(_predict_kernel, e1, e2, T1, T2, L, CB)
    xor1T, xor2T = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((L, CB), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((L, CB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, CB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Cp), jnp.uint32),
            jax.ShapeDtypeStruct((L, Cp), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((T1, CB), jnp.uint32),
            pltpu.VMEM((T2, CB), jnp.uint32),
        ],
        interpret=interpret,
    )(vT)
    return xor1T[:, :C].T, xor2T[:, :C].T


def _replay64_kernel(e1, e2, T1, T2, Ls, CB, n_slabs,
                     xh_ref, xl_ref, bc_ref, vh_ref, vl_ref,
                     t1h_ref, t1l_ref, t2h_ref, t2l_ref, st_ref):
    """f64 decode replay slab: tables + scalar carries persist across the
    inner (slab) grid dimension via scratch; semantics mirror
    fp64_jax.replay_f64_chunks (reference fps.c:803-1164)."""
    j = pl.program_id(1)
    m2 = np.uint32((1 << e2) - 1)
    iota1 = jax.lax.broadcasted_iota(jnp.uint32, (T1, CB), 0)
    iota2 = jax.lax.broadcasted_iota(jnp.uint32, (T2, CB), 0)

    @pl.when(j == 0)
    def _init():
        t1h_ref[:] = jnp.zeros((T1, CB), jnp.uint32)
        t1l_ref[:] = jnp.zeros((T1, CB), jnp.uint32)
        t2h_ref[:] = jnp.zeros((T2, CB), jnp.uint32)
        t2l_ref[:] = jnp.zeros((T2, CB), jnp.uint32)
        st_ref[:] = jnp.zeros((8, CB), jnp.uint32)

    def body(i, carry):
        h1, h2, p1h, p1l, p2h, p2l, lh, ll = carry
        xh = xh_ref[i, :].reshape(1, CB)
        xl = xl_ref[i, :].reshape(1, CB)
        bc = bc_ref[i, :].reshape(1, CB)
        # pred = last + DFCM stride (64-bit add with carry) when bc > 8
        al = ll + p2l
        d2h = lh + p2h + (al < ll).astype(jnp.uint32)
        dfcm = bc > 8
        vh = xh ^ jnp.where(dfcm, d2h, p1h)
        vl = xl ^ jnp.where(dfcm, al, p1l)
        vh_ref[i, :] = vh.reshape(CB)
        vl_ref[i, :] = vl.reshape(CB)
        t1h_ref[:] = jnp.where(iota1 == h1, vh, t1h_ref[:])
        t1l_ref[:] = jnp.where(iota1 == h1, vl, t1l_ref[:])
        h1n = (vh >> (32 - e1)) if e1 else h1
        p1h = _onehot_reduce(t1h_ref[:], iota1, h1n)
        p1l = _onehot_reduce(t1l_ref[:], iota1, h1n)
        # stride = v - last (64-bit subtract with borrow)
        sl = vl - ll
        sh = vh - lh - (vl < ll).astype(jnp.uint32)
        t2h_ref[:] = jnp.where(iota2 == h2, sh, t2h_ref[:])
        t2l_ref[:] = jnp.where(iota2 == h2, sl, t2l_ref[:])
        h2n = (((h2 << (e2 // 2)) ^ (sh >> (32 - e2))) & m2) if e2 else h2
        p2h = _onehot_reduce(t2h_ref[:], iota2, h2n)
        p2l = _onehot_reduce(t2l_ref[:], iota2, h2n)
        return (h1n, h2n, p1h, p1l, p2h, p2l, vh, vl)

    carry0 = tuple(st_ref[k, :].reshape(1, CB) for k in range(8))
    out = jax.lax.fori_loop(0, Ls, body, carry0)
    for k in range(8):
        st_ref[k, :] = out[k].reshape(CB)


def _predict64_window_kernel(e1, e2, T1, T2, Ls, K, CB, n_slabs,
                             vh_ref, vl_ref, x1h_ref, x1l_ref, x2h_ref,
                             x2l_ref, t1h_ref, t1l_ref, t2h_ref, t2l_ref,
                             st_ref):
    """Windowed f64 encode predictor (bit-exact mirror of
    :func:`_predict_window_kernel` on (hi, lo) word pairs).

    The f64 closed forms read only the hi word for both keys
    (``v >> (64-e)`` == ``hi >> (32-e)`` for normalized e ≤ 30 —
    fps.c:565-573): ``k1_i = vh_{i-1} >> (32-e1)`` and
    ``k2_i = th_{i-1} ^ ((th_{i-2} << e2/2) & m2)`` with
    ``th = stride_hi >> (32-e2)`` (64-bit stride with borrow). Scalar
    carries persist across slabs via scratch, exactly like
    :func:`_predict64_kernel`; the last 3 carry slots hold the previous
    th values the first window of a slab needs.
    """
    j = pl.program_id(1)
    m2 = np.uint32((1 << e2) - 1)
    sh2 = e2 // 2
    iota1 = jax.lax.broadcasted_iota(jnp.uint32, (T1, CB), 0)
    iota2 = jax.lax.broadcasted_iota(jnp.uint32, (T2, CB), 0)

    @pl.when(j == 0)
    def _init():
        t1h_ref[:] = jnp.zeros((T1, CB), jnp.uint32)
        t1l_ref[:] = jnp.zeros((T1, CB), jnp.uint32)
        t2h_ref[:] = jnp.zeros((T2, CB), jnp.uint32)
        t2l_ref[:] = jnp.zeros((T2, CB), jnp.uint32)
        st_ref[:] = jnp.zeros((4, CB), jnp.uint32)

    def window(w, carry):
        vph, vpl, tprev, tprev2 = carry
        base = w * K
        vhs, vls, k1s, shs, sls, k2s = [], [], [], [], [], []
        for q in range(K):
            vh = vh_ref[base + q, :].reshape(1, CB)
            vl = vl_ref[base + q, :].reshape(1, CB)
            ph = vhs[q - 1] if q else vph
            plo = vls[q - 1] if q else vpl
            vhs.append(vh)
            vls.append(vl)
            k1s.append(ph >> (32 - e1))
            sl = vl - plo
            sh = vh - ph - (vl < plo).astype(jnp.uint32)
            shs.append(sh)
            sls.append(sl)
            t_1 = (shs[q - 1] >> (32 - e2)) if q else tprev
            t_2 = ((shs[q - 2] >> (32 - e2)) if q >= 2
                   else (tprev if q == 1 else tprev2))
            k2s.append(t_1 ^ ((t_2 << sh2) & m2))
        for q in range(K):
            p1h = _onehot_reduce(t1h_ref[:], iota1, k1s[q])
            p1l = _onehot_reduce(t1l_ref[:], iota1, k1s[q])
            p2h = _onehot_reduce(t2h_ref[:], iota2, k2s[q])
            p2l = _onehot_reduce(t2l_ref[:], iota2, k2s[q])
            for i in range(q):
                hit1 = k1s[i] == k1s[q]
                p1h = jnp.where(hit1, vhs[i], p1h)
                p1l = jnp.where(hit1, vls[i], p1l)
                hit2 = k2s[i] == k2s[q]
                p2h = jnp.where(hit2, shs[i], p2h)
                p2l = jnp.where(hit2, sls[i], p2l)
            ph = vhs[q - 1] if q else vph
            plo = vls[q - 1] if q else vpl
            x1h_ref[base + q, :] = (vhs[q] ^ p1h).reshape(CB)
            x1l_ref[base + q, :] = (vls[q] ^ p1l).reshape(CB)
            al = plo + p2l
            d2h = ph + p2h + (al < plo).astype(jnp.uint32)
            x2h_ref[base + q, :] = (vhs[q] ^ d2h).reshape(CB)
            x2l_ref[base + q, :] = (vls[q] ^ al).reshape(CB)
        for q in range(K):
            t1h_ref[:] = jnp.where(iota1 == k1s[q], vhs[q], t1h_ref[:])
            t1l_ref[:] = jnp.where(iota1 == k1s[q], vls[q], t1l_ref[:])
            t2h_ref[:] = jnp.where(iota2 == k2s[q], shs[q], t2h_ref[:])
            t2l_ref[:] = jnp.where(iota2 == k2s[q], sls[q], t2l_ref[:])
        tl = shs[K - 1] >> (32 - e2)
        tl2 = (shs[K - 2] >> (32 - e2)) if K >= 2 else tprev
        return (vhs[K - 1], vls[K - 1], tl, tl2)

    carry0 = tuple(st_ref[k, :].reshape(1, CB) for k in range(4))
    out = jax.lax.fori_loop(0, Ls // K, window, carry0)
    for k in range(4):
        st_ref[k, :] = out[k].reshape(CB)


def _predict64_kernel(e1, e2, T1, T2, Ls, CB, n_slabs,
                      vh_ref, vl_ref, x1h_ref, x1l_ref, x2h_ref, x2l_ref,
                      t1h_ref, t1l_ref, t2h_ref, t2l_ref, st_ref):
    """f64 encode predictor slab: same table/carry persistence scheme as
    :func:`_replay64_kernel`; emits FCM and DFCM xors (fps.c:576-800)."""
    j = pl.program_id(1)
    m2 = np.uint32((1 << e2) - 1)
    iota1 = jax.lax.broadcasted_iota(jnp.uint32, (T1, CB), 0)
    iota2 = jax.lax.broadcasted_iota(jnp.uint32, (T2, CB), 0)

    @pl.when(j == 0)
    def _init():
        t1h_ref[:] = jnp.zeros((T1, CB), jnp.uint32)
        t1l_ref[:] = jnp.zeros((T1, CB), jnp.uint32)
        t2h_ref[:] = jnp.zeros((T2, CB), jnp.uint32)
        t2l_ref[:] = jnp.zeros((T2, CB), jnp.uint32)
        st_ref[:] = jnp.zeros((8, CB), jnp.uint32)

    def body(i, carry):
        h1, h2, p1h, p1l, p2h, p2l, lh, ll = carry
        vh = vh_ref[i, :].reshape(1, CB)
        vl = vl_ref[i, :].reshape(1, CB)
        x1h_ref[i, :] = (vh ^ p1h).reshape(CB)
        x1l_ref[i, :] = (vl ^ p1l).reshape(CB)
        al = ll + p2l
        d2h = lh + p2h + (al < ll).astype(jnp.uint32)
        x2h_ref[i, :] = (vh ^ d2h).reshape(CB)
        x2l_ref[i, :] = (vl ^ al).reshape(CB)
        t1h_ref[:] = jnp.where(iota1 == h1, vh, t1h_ref[:])
        t1l_ref[:] = jnp.where(iota1 == h1, vl, t1l_ref[:])
        h1n = (vh >> (32 - e1)) if e1 else h1
        p1h = _onehot_reduce(t1h_ref[:], iota1, h1n)
        p1l = _onehot_reduce(t1l_ref[:], iota1, h1n)
        sl = vl - ll
        sh = vh - lh - (vl < ll).astype(jnp.uint32)
        t2h_ref[:] = jnp.where(iota2 == h2, sh, t2h_ref[:])
        t2l_ref[:] = jnp.where(iota2 == h2, sl, t2l_ref[:])
        h2n = (((h2 << (e2 // 2)) ^ (sh >> (32 - e2))) & m2) if e2 else h2
        p2h = _onehot_reduce(t2h_ref[:], iota2, h2n)
        p2l = _onehot_reduce(t2l_ref[:], iota2, h2n)
        return (h1n, h2n, p1h, p1l, p2h, p2l, vh, vl)

    carry0 = tuple(st_ref[k, :].reshape(1, CB) for k in range(8))
    out = jax.lax.fori_loop(0, Ls, body, carry0)
    for k in range(8):
        st_ref[k, :] = out[k].reshape(CB)


def predict64_xors_pallas(hi: jax.Array, lo: jax.Array, e1: int, e2: int,
                          interpret: bool = False):
    """f64 encode predictor: (C, L) (hi, lo) → (x1h, x1l, x2h, x2l).

    Windowed K-positions-per-step when e1, e2 > 0 (bit-identical; same
    closed-form-key argument as the f32 :func:`predict_xors_pallas`). The
    window size is resolved OUTSIDE jit so the env override keys the
    compilation cache. Same 2D-grid/scratch layout as
    :func:`replay64_pallas`."""
    e1n, e2n = _norm_exponents(e1, e2)
    Ls = min(hi.shape[1], 1024)
    K = _window_k(Ls) if (e1n and e2n) else 0
    return _predict64_xors_pallas_impl(hi, lo, e1, e2, interpret, K)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _predict64_xors_pallas_impl(hi: jax.Array, lo: jax.Array, e1: int,
                                e2: int, interpret: bool, K: int):
    e1, e2 = _norm_exponents(e1, e2)
    C, L = hi.shape
    T1, T2 = 1 << e1, 1 << e2
    Ls = min(L, 1024)
    assert L % Ls == 0
    n_slabs = L // Ls
    budget = 14 * 1024 * 1024
    CB = C_BLK
    while CB > 128 and (2 * 6 * Ls + 2 * (T1 + T2)) * CB * 4 > budget:
        CB //= 2
    vhT, Cp = _pad_lanes(hi.T, CB)
    vlT, _ = _pad_lanes(lo.T, CB)
    if K:
        kern = functools.partial(_predict64_window_kernel, e1, e2, T1, T2,
                                 Ls, K, CB, n_slabs)
        n_carry = 4
    else:
        kern = functools.partial(_predict64_kernel, e1, e2, T1, T2, Ls, CB,
                                 n_slabs)
        n_carry = 8
    spec = pl.BlockSpec((Ls, CB), lambda i, j: (j, i), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(Cp // CB, n_slabs),
        in_specs=[spec, spec],
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((L, Cp), jnp.uint32)] * 4,
        scratch_shapes=[
            pltpu.VMEM((T1, CB), jnp.uint32),
            pltpu.VMEM((T1, CB), jnp.uint32),
            pltpu.VMEM((T2, CB), jnp.uint32),
            pltpu.VMEM((T2, CB), jnp.uint32),
            pltpu.VMEM((n_carry, CB), jnp.uint32),
        ],
        interpret=interpret,
    )(vhT, vlT)
    return tuple(o[:, :C].T for o in outs)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def replay64_pallas(bcodes: jax.Array, xhi: jax.Array, xlo: jax.Array,
                    e1: int, e2: int, interpret: bool = False):
    """f64 decode replay: (C, L) (bcode, xor hi/lo) → (hi, lo) u32 values.

    2D grid: lane blocks × L-slabs, with the four hash tables and the 8
    scalar carries held in scratch across slabs — so the per-step VMEM
    footprint is slab-sized (5 streams × Ls × CB), not L-sized, and CB stays
    at full lane width. Note the shift identities: for normalized e ≤ 30 the
    64-bit forms ``v >> (64-e)`` / ``stride >> (64-e)`` read only the hi
    word as ``hi >> (32-e)`` (fp64_jax closed forms)."""
    e1, e2 = _norm_exponents(e1, e2)
    C, L = xhi.shape
    T1, T2 = 1 << e1, 1 << e2
    Ls = min(L, 1024)
    assert L % Ls == 0
    n_slabs = L // Ls
    budget = 14 * 1024 * 1024
    CB = C_BLK
    while CB > 128 and (2 * 5 * Ls + 2 * (T1 + T2)) * CB * 4 > budget:
        CB //= 2
    xhT, Cp = _pad_lanes(xhi.T, CB)
    xlT, _ = _pad_lanes(xlo.T, CB)
    bcT, _ = _pad_lanes(bcodes.astype(jnp.uint32).T, CB)
    kern = functools.partial(_replay64_kernel, e1, e2, T1, T2, Ls, CB, n_slabs)
    spec = pl.BlockSpec((Ls, CB), lambda i, j: (j, i), memory_space=pltpu.VMEM)
    vhT, vlT = pl.pallas_call(
        kern,
        grid=(Cp // CB, n_slabs),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((L, Cp), jnp.uint32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((T1, CB), jnp.uint32),
            pltpu.VMEM((T1, CB), jnp.uint32),
            pltpu.VMEM((T2, CB), jnp.uint32),
            pltpu.VMEM((T2, CB), jnp.uint32),
            pltpu.VMEM((8, CB), jnp.uint32),
        ],
        interpret=interpret,
    )(xhT, xlT, bcT)
    return vhT[:, :C].T, vlT[:, :C].T


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def replay_pallas(bcodes: jax.Array, xors: jax.Array, e1: int, e2: int,
                  interpret: bool = False):
    """Decode replay: (C, L) (bcode, xor) → (C, L) uint32 values (f32 path)."""
    e1, e2 = _norm_exponents(e1, e2)
    C, L = xors.shape
    T1, T2 = 1 << e1, 1 << e2
    CB = _c_blk(L, T1, T2)
    xT, Cp = _pad_lanes(xors.T, CB)
    bT, _ = _pad_lanes(bcodes.astype(jnp.uint32).T, CB)
    kern = functools.partial(_replay_kernel, e1, e2, T1, T2, L, CB, 4)
    outT = pl.pallas_call(
        kern,
        grid=(Cp // CB,),
        in_specs=[
            pl.BlockSpec((L, CB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, CB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, CB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, Cp), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((T1, CB), jnp.uint32),
            pltpu.VMEM((T2, CB), jnp.uint32),
        ],
        interpret=interpret,
    )(xT, bT)
    return outT[:, :C].T
