"""Parity tests for the Pallas TPU predictor kernels (interpret mode on CPU).

The Pallas kernels (`trico_tpu/codec/fp_pallas.py`) are the production path on
real TPU backends. These tests execute the same kernels through the Pallas
interpreter so their math is pinned to the XLA-scan path and the NumPy oracle
(`fp_ref.predictions`) on every CPU test run — round 1 shipped them with zero
coverage and they were wrong on hardware (VERDICT.md round 1, missing #1).

Reference semantics being checked: the FCM/DFCM recurrence of
/root/reference/trico/floating_point_stream_compression.c:76-210 (encode) and
:212-417 (decode replay), per chunk with fresh tables.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from trico_tpu.codec import fp_jax, fp_pallas, fp_ref

from conftest import mesh_like_floats


def _chunks(n_chunks, L, seed=0):
    vals = mesh_like_floats(n_chunks * L, seed=seed).view(np.uint32)
    return vals.reshape(n_chunks, L)


@pytest.mark.parametrize("e1,e2", [(4, 10), (4, 8), (0, 10), (4, 0), (10, 16)])
def test_predict_xors_interpret_matches_oracle(e1, e2):
    C, L = 3, 256
    chunks = _chunks(C, L, seed=42)
    xor1, xor2 = fp_pallas.predict_xors_pallas(jnp.asarray(chunks), e1, e2, True)
    xor1, xor2 = np.asarray(xor1), np.asarray(xor2)
    for c in range(C):
        p1, p2 = fp_ref.predictions(chunks[c], e1, e2)
        np.testing.assert_array_equal(xor1[c], chunks[c] ^ p1)
        np.testing.assert_array_equal(xor2[c], chunks[c] ^ p2)


@pytest.mark.parametrize("e1,e2", [(4, 10), (4, 8)])
def test_predict_xors_interpret_matches_scan(e1, e2):
    """Pallas (interpret) == XLA scan, including at a non-multiple of C_BLK
    lanes (exercises the pad/trim edge at C_BLK)."""
    C, L = 5, 128
    chunks = _chunks(C, L, seed=7)
    xor1p, xor2p = fp_pallas.predict_xors_pallas(jnp.asarray(chunks), e1, e2, True)
    bc_s, res_s = fp_jax._predict_scan(jnp.asarray(chunks), *fp_jax._norm_exponents(e1, e2))
    bc_p, res_p = fp_jax._bcode_res_from_xors(xor1p, xor2p)
    np.testing.assert_array_equal(np.asarray(bc_p), np.asarray(bc_s))
    np.testing.assert_array_equal(np.asarray(res_p), np.asarray(res_s))


@pytest.mark.parametrize("e1,e2", [(4, 10), (4, 8)])
def test_replay_interpret_roundtrip(e1, e2):
    """encode (scan) -> replay (Pallas interpret) must reproduce the input."""
    C, L = 3, 256
    chunks = _chunks(C, L, seed=3)
    e1n, e2n = fp_jax._norm_exponents(e1, e2)
    bcode, res = fp_jax._predict_scan(jnp.asarray(chunks), e1n, e2n)
    vals = fp_pallas.replay_pallas(bcode, res, e1, e2, True)
    np.testing.assert_array_equal(np.asarray(vals), chunks)


def test_predict_replay_interpret_composite():
    """Full interpret-mode composite: Pallas predict -> pack -> parse ->
    Pallas replay, at the bench's production settings."""
    e1, e2 = 4, 8
    C, L = 2, 512
    chunks = _chunks(C, L, seed=11)
    xor1, xor2 = fp_pallas.predict_xors_pallas(jnp.asarray(chunks), e1, e2, True)
    bcode, res = fp_jax._bcode_res_from_xors(xor1, xor2)
    payloads, sizes = fp_jax.pack_f32_chunks_v2(bcode, res, e1, e2)
    bc2, xors2 = fp_jax.parse_f32_chunks_v2(payloads, L, e1, e2)
    vals = fp_pallas.replay_pallas(bc2, xors2, e1, e2, True)
    np.testing.assert_array_equal(np.asarray(vals), chunks)


def test_pallas_wide_block_edge():
    """More lanes than one C_BLK block (grid > 1) plus a ragged remainder."""
    e1, e2 = 4, 8
    C = fp_pallas.C_BLK + 17
    L = 64
    chunks = _chunks(C, L, seed=5)
    xor1p, xor2p = fp_pallas.predict_xors_pallas(jnp.asarray(chunks), e1, e2, True)
    bc_p, res_p = fp_jax._bcode_res_from_xors(xor1p, xor2p)
    bc_s, res_s = fp_jax._predict_scan(jnp.asarray(chunks), e1, e2)
    np.testing.assert_array_equal(np.asarray(bc_p), np.asarray(bc_s))
    np.testing.assert_array_equal(np.asarray(res_p), np.asarray(res_s))


def test_shared_e2_candidate_xors_interpret_matches_fallback(monkeypatch):
    """The shared-e2 fast path in `fp_jax._candidate_xors` (one fused
    (e1_main, e2) Pallas pass + one FCM-only multi-exponent pass + the e1=0
    XLA branch) is only taken when `_use_pallas()` is true, so CPU CI
    normally exercises just the per-candidate fallback (ADVICE r3). Force the
    shared path through interpret-mode kernels and compare every candidate's
    (xor1, xor2) — and the resulting adaptive encode — against the sort-
    predictor fallback."""
    C, L = 3, 256
    chunks = _chunks(C, L, seed=23)
    v = jnp.asarray(chunks)
    norm = [fp_jax._norm_exponents(e1, e2) for (e1, e2) in fp_jax.F32_TPU_CANDIDATES]

    # expected: the per-candidate fallback (pure XLA sort predictor)
    want = [fp_jax._predict_sort(v, e1, e2) for (e1, e2) in norm]

    # force the shared path, with interpret-mode Pallas kernels so it runs
    # exactly the production composition on CPU
    monkeypatch.setattr(fp_jax, "_use_pallas", lambda: True)
    monkeypatch.setattr(fp_jax, "_predict_mode", lambda: "pallas")
    real_pred = fp_pallas.predict_xors_pallas
    real_fcm = fp_pallas.predict_fcm_xors_pallas
    real_logshift = fp_pallas.logshift_pallas
    real_replay = fp_pallas.replay_pallas
    monkeypatch.setattr(
        fp_pallas, "predict_xors_pallas",
        lambda vals, e1, e2, interpret=False: real_pred(vals, e1, e2, True))
    monkeypatch.setattr(
        fp_pallas, "predict_fcm_xors_pallas",
        lambda vals, e1s, interpret=False: real_fcm(vals, e1s, True))
    monkeypatch.setattr(
        fp_pallas, "logshift_pallas",
        lambda w, pb, direction, interpret=False: real_logshift(
            w, pb, direction, True))
    monkeypatch.setattr(
        fp_pallas, "replay_pallas",
        lambda bc, res, e1, e2, interpret=False: real_replay(
            bc, res, e1, e2, True))
    real_pair = fp_pallas.pair_compact_or_pallas
    monkeypatch.setattr(
        fp_pallas, "pair_compact_or_pallas",
        lambda carrier, payload, nbits, interpret=False: real_pair(
            carrier, payload, nbits, True))

    got = fp_jax._candidate_xors(v, norm)
    assert len(got) == len(want)
    for k, ((x1g, x2g), (x1w, x2w)) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(np.asarray(x1g), np.asarray(x1w),
                                      err_msg=f"candidate {norm[k]} xor1")
        np.testing.assert_array_equal(np.asarray(x2g), np.asarray(x2w),
                                      err_msg=f"candidate {norm[k]} xor2")

    # and the full adaptive encode through the forced shared path must match
    # the fallback encode byte-for-byte
    pay_shared, sz_shared = fp_jax._encode_f32_chunks_v2_adaptive_impl(
        v, fp_jax.F32_TPU_CANDIDATES)
    monkeypatch.setattr(fp_jax, "_use_pallas", lambda: False)
    pay_fb, sz_fb = fp_jax._encode_f32_chunks_v2_adaptive_impl(
        v, fp_jax.F32_TPU_CANDIDATES)
    np.testing.assert_array_equal(np.asarray(sz_shared), np.asarray(sz_fb))
    np.testing.assert_array_equal(np.asarray(pay_shared), np.asarray(pay_fb))


@pytest.mark.parametrize("direction", ["left", "right"])
@pytest.mark.parametrize("S", [128, 512, 4096])
def test_logshift_pallas_interpret_matches_xla(direction, S):
    """The VMEM log-shift kernel is bit-identical to the XLA formulation on
    random monotone movements (the pack/parse compaction workhorse)."""
    import jax.numpy as jnp

    from trico_tpu.codec import fp_jax, fp_pallas

    rng = np.random.default_rng(S)
    C, pb = 5, 8
    # build a random monotone partial permutation: choose live slots and
    # target ranks, both increasing
    words = np.zeros((C, S), np.uint32)
    for c in range(C):
        n_live = rng.integers(1, S)
        src = np.sort(rng.choice(S, n_live, replace=False))
        dst = np.sort(rng.choice(S, n_live, replace=False))
        if direction == "left":
            keep = dst <= src
        else:
            keep = dst >= src
        src, dst = src[keep], dst[keep]
        shift = np.abs(src - dst).astype(np.uint32)
        payload = rng.integers(1, 1 << pb, len(src), dtype=np.uint32)
        words[c, src] = (shift << pb) | payload
    w = jnp.asarray(words)
    want = fp_jax._logshift_passes(w, pb, S, direction) & jnp.uint32((1 << pb) - 1)
    got = fp_pallas.logshift_pallas(w, pb, direction, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("e1,e2", [(4, 6), (4, 10)])
def test_replay64_interpret_roundtrip(e1, e2):
    """f64 encode (scan predictor) -> Pallas replay64 (interpret) must
    reproduce the input, incl. across the 1024-row slab boundary."""
    from trico_tpu.codec import fp64_jax

    C, L = 3, 2048
    vals = mesh_like_floats(C * L, seed=9, dtype=np.float64).view(np.uint64)
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32).reshape(C, L))
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(C, L))
    bc, rh, rl = fp64_jax.predict_f64_chunks(hi, lo, e1, e2)
    vh, vl = fp_pallas.replay64_pallas(bc, rh, rl, e1, e2, True)
    np.testing.assert_array_equal(np.asarray(vh), np.asarray(hi))
    np.testing.assert_array_equal(np.asarray(vl), np.asarray(lo))


@pytest.mark.parametrize("e1,e2", [(4, 6), (4, 10)])
def test_predict64_interpret_matches_sort(e1, e2):
    """f64 Pallas predictor (interpret) == sort predictor, across the slab
    boundary."""
    from trico_tpu.codec import fp64_jax

    C, L = 3, 2048
    vals = mesh_like_floats(C * L, seed=13, dtype=np.float64).view(np.uint64)
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32).reshape(C, L))
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(C, L))
    got = fp_pallas.predict64_xors_pallas(hi, lo, e1, e2, True)
    want = fp64_jax._predict_sort64(hi, lo, *fp64_jax._norm_exponents(e1, e2))
    for g, w, name in zip(got, want, ("x1h", "x1l", "x2h", "x2l")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=name)


@pytest.mark.parametrize("K", [2, 4, 8])
@pytest.mark.parametrize("e1,e2", [(4, 6), (4, 10)])
def test_predict64_window_kernel_parity(monkeypatch, K, e1, e2):
    """Windowed f64 encode predictor == sort predictor, across the 1024-row
    slab boundary (carry slots vph/vpl/tprev/tprev2 persist via scratch),
    any K; K=0 pins the 1-position fallback."""
    from trico_tpu.codec import fp64_jax

    C, L = 3, 2048
    vals = mesh_like_floats(C * L, seed=17 + K, dtype=np.float64).view(np.uint64)
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32).reshape(C, L))
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(C, L))
    monkeypatch.setenv("TRICO_TPU_PALLAS_WINDOW", str(K))
    got = fp_pallas.predict64_xors_pallas(hi, lo, e1, e2, True)
    monkeypatch.setenv("TRICO_TPU_PALLAS_WINDOW", "0")
    plain = fp_pallas.predict64_xors_pallas(hi, lo, e1, e2, True)
    want = fp64_jax._predict_sort64(hi, lo, *fp64_jax._norm_exponents(e1, e2))
    for g, p, w, name in zip(got, plain, want, ("x1h", "x1l", "x2h", "x2l")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=f"windowed {name}")
        np.testing.assert_array_equal(np.asarray(p), np.asarray(w),
                                      err_msg=f"plain {name}")


@pytest.mark.parametrize("K", [2, 4, 8, 16])
@pytest.mark.parametrize("e1,e2", [(4, 6), (4, 10), (2, 8)])
def test_predict_window_kernel_parity(monkeypatch, K, e1, e2):
    """Windowed K-positions-per-step encode predictor == oracle, any K
    (VERDICT r4 #5). Also pins the K=0 (disabled) fallback."""
    C, L = 3, 128
    chunks = _chunks(C, L, seed=11 + K)
    monkeypatch.setenv("TRICO_TPU_PALLAS_WINDOW", str(K))
    xor1, xor2 = fp_pallas.predict_xors_pallas(jnp.asarray(chunks), e1, e2, True)
    monkeypatch.setenv("TRICO_TPU_PALLAS_WINDOW", "0")
    xor1b, xor2b = fp_pallas.predict_xors_pallas(jnp.asarray(chunks), e1, e2, True)
    np.testing.assert_array_equal(np.asarray(xor1), np.asarray(xor1b))
    np.testing.assert_array_equal(np.asarray(xor2), np.asarray(xor2b))
    for c in range(C):
        p1, p2 = fp_ref.predictions(chunks[c], e1, e2)
        np.testing.assert_array_equal(np.asarray(xor1)[c], chunks[c] ^ p1)
        np.testing.assert_array_equal(np.asarray(xor2)[c], chunks[c] ^ p2)


@pytest.mark.parametrize("cands", [
    ((0, 6), (4, 6), (4, 10), (14, 18)),   # production default (mixed e2)
    ((0, 6), (4, 6), (8, 6), (4, 10)),     # 3-member fused group + singleton
    ((0, 8), (0, 6), (4, 6)),              # e1=0 members in two e2 groups
    ((4, 10), (14, 18)),                   # singletons only (no fusion)
])
def test_candidate_xors_grouped_fusion_matches_sort(monkeypatch, cands):
    """_candidate_xors per-e2 group fusion == the sort oracle for every
    grouping shape (r5: the FCM xor depends only on e1 and the DFCM xor only
    on e2, so mixed-e2 sets fuse per group instead of falling back to one
    full predictor per candidate)."""
    C, L = 4, 256
    chunks = _chunks(C, L, seed=77)
    v = jnp.asarray(chunks)
    norm = [fp_jax._norm_exponents(e1, e2) for (e1, e2) in cands]
    want = [fp_jax._predict_sort(v, e1, e2) for (e1, e2) in norm]
    monkeypatch.setattr(fp_jax, "_use_pallas", lambda: True)
    monkeypatch.setattr(fp_jax, "_predict_mode", lambda: "pallas")
    real_pred = fp_pallas.predict_xors_pallas
    real_fcm = fp_pallas.predict_fcm_xors_pallas
    monkeypatch.setattr(
        fp_pallas, "predict_xors_pallas",
        lambda vals, e1, e2, interpret=False: real_pred(vals, e1, e2, True))
    monkeypatch.setattr(
        fp_pallas, "predict_fcm_xors_pallas",
        lambda vals, e1s, interpret=False: real_fcm(vals, e1s, True))
    got = fp_jax._candidate_xors(v, norm)
    for k, ((x1g, x2g), (x1w, x2w)) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(np.asarray(x1g), np.asarray(x1w),
                                      err_msg=f"cand {norm[k]} xor1")
        np.testing.assert_array_equal(np.asarray(x2g), np.asarray(x2w),
                                      err_msg=f"cand {norm[k]} xor2")


def test_logshift_rows_fit_scoped_vmem(monkeypatch):
    """The row blocks actually used by each compaction kernel keep its
    double-buffered tiles inside the 16 MiB scoped-VMEM limit (r5: BP32's
    S=65536 slot arrays compiled fine on the limit-free CPU backend but
    VMEM-OOMed at compile time on real TPUs — the first hardware run of
    compress_mesh with triangles). Budgets are asserted against each
    kernel's true buffer count (log-shift: 1 in + 1 out; pair-compaction:
    2 in + 1 out), not against _rows_for's own formula — including
    non-power-of-two widths where only the pair kernel overflows."""
    monkeypatch.setattr(fp_pallas, "_R_SUB", 16)
    limit = 16 * 1024 * 1024
    for S in (16384, 32768, 44032, 49152, 65536, 131072):
        r_log = fp_pallas._rows_for(S)
        assert 2 * 2 * r_log * S * 4 <= limit, ("logshift", S, r_log)
        r_pair = fp_pallas._rows_for(S, n_tiles=6)
        assert 2 * 3 * r_pair * S * 4 <= limit, ("pair", S, r_pair)
        assert r_log >= 1 and r_pair >= 1
    # production shapes keep the measured default
    assert fp_pallas._rows_for(16384) == 16
    assert fp_pallas._rows_for(32768) == 16


def test_logshift_reduced_rows_parity_wide():
    """Interpret-mode parity at a width where _rows_for halves R (the BP32
    S=65536 production shape) — the reduced-R grid/padding path must stay
    bit-identical to the XLA formulation, not just compile on hardware."""
    S, pb, C = 65536, 8, 3
    assert fp_pallas._rows_for(S) < fp_pallas._R_SUB or fp_pallas._R_SUB == 1
    rng = np.random.default_rng(9)
    words = np.zeros((C, S), np.uint32)
    for c in range(C):
        n_live = rng.integers(1, S // 2)
        src = np.sort(rng.choice(S, n_live, replace=False))
        dst = np.sort(rng.choice(S, n_live, replace=False))
        keep = dst <= src
        src, dst = src[keep], dst[keep]
        shift = (src - dst).astype(np.uint32)
        payload = rng.integers(1, 1 << pb, len(src), dtype=np.uint32)
        words[c, src] = (shift << pb) | payload
    w = jnp.asarray(words)
    want = fp_jax._logshift_passes(w, pb, S, "left") & jnp.uint32((1 << pb) - 1)
    got = fp_pallas.logshift_pallas(w, pb, "left", True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pair_compact_reduced_rows_parity_wide():
    """Same for the merging pair-compaction at a non-power-of-two width
    where only its 6-tile footprint forces a smaller R (S=49152)."""
    from trico_tpu.codec import pack_funnel

    S, C = 49152, 3
    rng = np.random.default_rng(5)
    carrier = np.zeros((C, S), np.uint32)
    payload = np.zeros((C, S), np.uint32)
    for c in range(C):
        n_live = rng.integers(1, S // 2)
        src = np.sort(rng.choice(S, n_live, replace=False))
        dst = np.sort(rng.choice(S, n_live, replace=False))
        keep = dst <= src
        src, dst = src[keep], dst[keep]
        carrier[c, src] = (((src - dst).astype(np.uint32)) << 1) | 1
        payload[c, src] = rng.integers(1, 1 << 30, len(src), dtype=np.uint32)
    nbits = (S - 1).bit_length()
    want = pack_funnel._pair_compact_or_xla(
        jnp.asarray(carrier), jnp.asarray(payload), nbits)
    got = fp_pallas.pair_compact_or_pallas(
        jnp.asarray(carrier), jnp.asarray(payload), nbits, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
