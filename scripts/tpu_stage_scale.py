"""Which stage breaks at C=8192? On-device comparisons, ONE D2H at the end.

Checks, in order (all counts collected into one device vector):
  0 h2d checksum delta (device vs host)
  1 predict determinism (two runs differ?)
  2 pack determinism
  3 parse determinism
  4 parse.bcodes vs predict.bcodes
  5 parse.xors  vs predict.res
  6 pack sliced-vs-full payload mismatches
  7 parse sliced-vs-full (bc+xor) mismatches
  8 replay(parse) vs input
  9 first mismatching row of (5)
 10 first mismatching col of (5)
"""
import os
import sys
from pathlib import Path

os.environ.setdefault("TRICO_TPU_SCAN_UNROLL", "8")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from trico_tpu.codec import fp_jax

L = 1024
E1, E2 = 4, 8
C = 8192
CS = 1024
print(f"backend={jax.default_backend()} C={C} L={L}", flush=True)

_ = int(jnp.zeros((1,), jnp.int32)[0])  # warm the D2H channel
print("d2h warm", flush=True)

r = np.random.default_rng(0)
N = C * L
t = np.linspace(0, 500 * np.pi, N)
vals = (np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, N))).astype(np.float32)
x_np = vals.view(np.uint32).reshape(C, L)
host_sum = x_np.sum(dtype=np.uint32)
x = jnp.asarray(x_np)
jax.block_until_ready(x)
print("uploaded", flush=True)

counts = []


def nneq(a, b):
    return jnp.sum((a != b).astype(jnp.int32))


# 0 checksum
dev_sum = jnp.sum(x)
counts.append((dev_sum != jnp.uint32(host_sum)).astype(jnp.int32))

# 1 predict determinism
bc1, res1 = fp_jax.predict_f32_chunks(x, E1, E2)
bc2, res2 = fp_jax.predict_f32_chunks(x | jnp.uint32(0), E1, E2)  # force re-run
counts.append(nneq(bc1, bc2) + nneq(res1, res2))

# 2 pack determinism
pay1, sz1 = fp_jax.pack_f32_chunks_v2(bc1, res1, E1, E2)
pay2, sz2 = fp_jax.pack_f32_chunks_v2(bc1 | jnp.uint8(0), res1, E1, E2)
counts.append(nneq(pay1, pay2) + nneq(sz1, sz2))

# 3 parse determinism
pb1, px1 = fp_jax.parse_f32_chunks_v2(pay1, L, E1, E2)
pb2, px2 = fp_jax.parse_f32_chunks_v2(pay1 | jnp.uint8(0), L, E1, E2)
counts.append(nneq(pb1, pb2) + nneq(px1, px2))

# 4/5 parse vs predict
counts.append(nneq(pb1, bc1))
counts.append(nneq(px1, res1))

# 6 pack sliced vs full
acc = jnp.int32(0)
for i in range(0, C, CS):
    pay_i, sz_i = fp_jax.pack_f32_chunks_v2(bc1[i : i + CS], res1[i : i + CS], E1, E2)
    acc = acc + nneq(pay1[i : i + CS], pay_i) + nneq(sz1[i : i + CS], sz_i)
counts.append(acc)

# 7 parse sliced vs full
acc = jnp.int32(0)
for i in range(0, C, CS):
    pb_i, px_i = fp_jax.parse_f32_chunks_v2(pay1[i : i + CS], L, E1, E2)
    acc = acc + nneq(pb1[i : i + CS], pb_i) + nneq(px1[i : i + CS], px_i)
counts.append(acc)

# 8 replay vs input
v = fp_jax.replay_f32_chunks(pb1, px1, E1, E2)
counts.append(nneq(v, x))

# 9/10 first mismatch coordinates of parse.xors vs predict.res
neq = px1 != res1
anyrow = jnp.any(neq, axis=1)
frow = jnp.argmax(anyrow)
fcol = jnp.argmax(neq[frow])
counts.append(frow.astype(jnp.int32))
counts.append(fcol.astype(jnp.int32))
counts.append(px1[frow, fcol].astype(jnp.int32))
counts.append(res1[frow, fcol].astype(jnp.int32))
counts.append(bc1[frow, fcol].astype(jnp.int32))

out = np.asarray(jnp.stack(counts))
names = ["h2d_checksum_bad", "predict_nondet", "pack_nondet", "parse_nondet",
         "parse_bc_vs_gold", "parse_xor_vs_gold", "pack_slice_vs_full",
         "parse_slice_vs_full", "replay_vs_input",
         "first_row", "first_col", "px_at", "res_at", "bc_at"]
for n, v_ in zip(names, out):
    print(f"{n}: {v_:#x}" if n in ("px_at", "res_at") else f"{n}: {v_}", flush=True)
print("done", flush=True)
