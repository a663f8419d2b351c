"""Find the (C, L) threshold where the TPU round-trip goes inexact."""
import os
import sys
from pathlib import Path

os.environ.setdefault("TRICO_TPU_SCAN_UNROLL", "8")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from trico_tpu.codec import fp_jax, fp_pallas

L = int(os.environ.get("BISECT_CHUNK", "1024"))
E1, E2 = 4, 8
print(f"backend={jax.default_backend()} L={L}", flush=True)

r = np.random.default_rng(0)
NMAX = 8 * 1024 * 1024
t = np.linspace(0, 500 * np.pi, NMAX)
vals_all = (np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, NMAX))).astype(np.float32)
raw_all = vals_all.view(np.uint32)

for C in (512, 1024, 2048, 8192):
    x_np = raw_all[: C * L].reshape(C, L)
    x = jnp.asarray(x_np)
    pay, sz = fp_jax.encode_f32_chunks_v2(x, E1, E2)
    dec = fp_jax.decode_f32_chunks_v2(pay, L, E1, E2)
    neq = np.asarray(dec != x)
    n = int(neq.sum())
    if n == 0:
        print(f"C={C}: e2e exact", flush=True)
        continue
    rows = np.unique(np.argwhere(neq)[:, 0])
    cols = np.unique(np.argwhere(neq)[:, 1])
    print(f"C={C}: e2e {n} mismatches; rows {rows[:8]}... ({len(rows)}), "
          f"cols {cols[:8]}... ({len(cols)})", flush=True)
    # bisect inner stages at this size
    bc, xr = fp_jax.parse_f32_chunks_v2(pay, L, E1, E2)
    gb, gr = fp_jax.predict_f32_chunks(x, E1, E2)
    pm = int(np.asarray(bc != gb).sum()) + int(np.asarray(xr != gr).sum())
    print(f"  parse(bc,xor) vs predict(gold): {pm} mismatches", flush=True)
    v_pal = fp_pallas.replay_pallas(bc, xr, E1, E2, False)
    print(f"  pallas replay vs input: {int(np.asarray(v_pal != x).sum())} mismatches",
          flush=True)
    os.environ["TRICO_TPU_PALLAS"] = "0"
    v_scan = jax.jit(lambda b, q: fp_jax._replay_impl(b, q, E1, E2))(bc, xr)
    os.environ.pop("TRICO_TPU_PALLAS")
    print(f"  xla scan replay vs input: {int(np.asarray(v_scan != x).sum())} mismatches",
          flush=True)
    break
print("done", flush=True)
