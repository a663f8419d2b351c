#!/usr/bin/env python
"""Reproduce/localize the TPU Pallas exactness bug (round-1 BENCH exact:false).

Runs small compiled cases on the real chip and diffs:
  1. predict_xors_pallas (compiled) vs _predict_scan (XLA, same device)
  2. replay_pallas (compiled) vs scan replay
  3. the bench composite encode->decode at its exact shapes
Prints the first diverging (chunk, position) and the values around it.
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("TRICO_TPU_SCAN_UNROLL", "1")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from trico_tpu.codec import fp_jax, fp_pallas


def mesh_like(n, seed=0):
    r = np.random.default_rng(seed)
    t = np.linspace(0, 20 * np.pi, n)
    return (np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, n))).astype(np.float32)


def diff_report(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    if np.array_equal(a, b):
        print(f"{name}: EXACT", flush=True)
        return True
    bad = np.argwhere(a != b)
    c, i = bad[0]
    print(f"{name}: DIFF at {len(bad)}/{a.size} positions; first (chunk={c}, pos={i})")
    print(f"  got  {a[c, max(0,i-2):i+3]}")
    print(f"  want {b[c, max(0,i-2):i+3]}", flush=True)
    return False


def case(C, L, e1, e2, seed=0):
    print(f"--- case C={C} L={L} e=({e1},{e2}) ---", flush=True)
    vals = mesh_like(C * L, seed).view(np.uint32).reshape(C, L)
    x = jnp.asarray(vals)
    xor1p, xor2p = fp_pallas.predict_xors_pallas(x, e1, e2, False)
    e1n, e2n = fp_jax._norm_exponents(e1, e2)
    bc_s, res_s = fp_jax._predict_scan(x, e1n, e2n)
    bc_p, res_p = fp_jax._bcode_res_from_xors(xor1p, xor2p)
    ok1 = diff_report("predict bcode", bc_p, bc_s)
    ok2 = diff_report("predict res", res_p, res_s)
    vp = fp_pallas.replay_pallas(bc_s, res_s, e1, e2, False)
    ok3 = diff_report("replay", vp, vals)
    return ok1 and ok2 and ok3


if __name__ == "__main__":
    results = {}
    for C, L, e1, e2 in [
        (8, 64, 4, 8),
        (8, 64, 4, 10),
        (512, 64, 4, 8),
        (513, 64, 4, 8),       # pad edge
        (1024, 1024, 4, 8),    # two grid blocks, bench-like depth
    ]:
        results[(C, L, e1, e2)] = case(C, L, e1, e2)
    # bench composite at round-1 shapes (scaled down chunk count)
    n, L = 1024 * 256, 1024
    raw = mesh_like(n, 0).view(np.uint32)
    C = n // L
    x = jnp.asarray(raw.reshape(C, L))
    payloads, sizes = fp_jax.encode_f32_chunks_v2(x, 4, 8)
    dec = fp_jax.decode_f32_chunks_v2(payloads, L, 4, 8)
    exact = bool(jnp.all(dec == x))
    print("bench composite exact:", exact, flush=True)
    print("summary:", results, flush=True)
