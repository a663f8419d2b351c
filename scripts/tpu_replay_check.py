"""Check the decode replay stage on real TPU: Pallas kernel vs XLA scan vs truth.

Ground truth: parse of gold payloads yields gold (bcode, xor); replay must
reproduce the original values exactly (decode inverts encode).
"""
import os
import sys
from pathlib import Path

os.environ.setdefault("TRICO_TPU_SCAN_UNROLL", "8")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from trico_tpu.codec import fp_jax, fp_pallas

N = int(os.environ.get("BISECT_VALUES", str(256 * 1024)))
L = int(os.environ.get("BISECT_CHUNK", "1024"))
E1 = int(os.environ.get("BISECT_E1", "4"))
E2 = int(os.environ.get("BISECT_E2", "8"))

r = np.random.default_rng(0)
t = np.linspace(0, 500 * np.pi, N)
vals = (np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, N))).astype(np.float32)
raw = vals.view(np.uint32)
C = N // L
x_np = raw[: C * L].reshape(C, L)
print(f"backend={jax.default_backend()} C={C} L={L} e=({E1},{E2})", flush=True)

x = jnp.asarray(x_np)
pay, sz = fp_jax.encode_f32_chunks_v2(x, E1, E2)   # proven exact on TPU
bc, xr = fp_jax.parse_f32_chunks_v2(pay, L, E1, E2)  # proven exact on TPU


def cmp(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    neq = a != b
    n = int(neq.sum())
    if n == 0:
        print(f"{name}: exact", flush=True)
        return
    idx = tuple(np.argwhere(neq)[0])
    print(f"{name}: {n}/{a.size} mismatches; first at {idx}: "
          f"got={a[idx]:#x} want={b[idx]:#x}", flush=True)
    # mismatch pattern: which rows, which cols
    rows = np.unique(np.argwhere(neq)[:, 0])
    cols = np.unique(np.argwhere(neq)[:, 1])
    print(f"  rows: {rows[:10]}{'...' if len(rows) > 10 else ''} "
          f"({len(rows)} rows); cols: {cols[:10]}"
          f"{'...' if len(cols) > 10 else ''} ({len(cols)} cols)", flush=True)


v_pallas = fp_pallas.replay_pallas(bc, xr, E1, E2, False)
cmp("pallas_replay", v_pallas, x_np)

scan_jit = jax.jit(
    lambda b, q: fp_jax._predict_scan.__wrapped__ if False else None)
# XLA scan replay without Pallas: trace _replay_impl with env forced off
os.environ["TRICO_TPU_PALLAS"] = "0"
v_scan = jax.jit(lambda b, q: fp_jax._replay_impl(b, q, E1, E2))(bc, xr)
cmp("xla_scan_replay", v_scan, x_np)
print("done", flush=True)
