"""Bisect TPU-vs-CPU bit-exactness per codec stage.

Runs each device stage of the v2 f32 pipeline on both the real TPU and the
in-process CPU backend with identical inputs, and reports the first stage
whose outputs differ. CPU is the verified-exact oracle (round-1 verdict).
"""
import os

os.environ.setdefault("TRICO_TPU_SCAN_UNROLL", "1")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# sitecustomize pins JAX_PLATFORMS=axon and imports jax at interpreter startup;
# the config update (not the env var) is what adds the CPU backend back.
jax.config.update("jax_platforms", "axon,cpu")
import jax.numpy as jnp
import numpy as np

from trico_tpu.codec import fp_jax

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

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
print(f"devices: tpu={tpu}, cpu={cpu}; C={C} L={L} e=({E1},{E2})", flush=True)


def on(dev, fn, *args):
    with jax.default_device(dev):
        out = fn(*[jnp.asarray(np.asarray(a)) for a in args])
    return jax.tree.map(np.asarray, out)


def cmp(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    if a.shape != b.shape:
        print(f"{name}: SHAPE MISMATCH {a.shape} vs {b.shape}", flush=True)
        return False
    neq = a != b
    n = int(neq.sum())
    if n == 0:
        print(f"{name}: exact", flush=True)
        return True
    idx = np.argwhere(neq)[0]
    print(f"{name}: {n} mismatches; first at {tuple(idx)}: "
          f"tpu={a[tuple(idx)]} cpu={b[tuple(idx)]}", flush=True)
    return False


# stage 1: predict (sort-based closed form)
bc_t, res_t = on(tpu, lambda v: fp_jax.predict_f32_chunks(v, E1, E2), x_np)
bc_c, res_c = on(cpu, lambda v: fp_jax.predict_f32_chunks(v, E1, E2), x_np)
cmp("predict.bcode", bc_t, bc_c)
cmp("predict.res", res_t, res_c)

# stage 2: pack_v2 from CPU-gold (bcode, res)
pay_t, sz_t = on(tpu, lambda b, q: fp_jax.pack_f32_chunks_v2(b, q, E1, E2), bc_c, res_c)
pay_c, sz_c = on(cpu, lambda b, q: fp_jax.pack_f32_chunks_v2(b, q, E1, E2), bc_c, res_c)
cmp("pack.sizes", sz_t, sz_c)
cmp("pack.payloads", pay_t, pay_c)

# stage 3: parse_v2 from CPU-gold payloads
pb_t, px_t = on(tpu, lambda p: fp_jax.parse_f32_chunks_v2(p, L, E1, E2), pay_c)
pb_c, px_c = on(cpu, lambda p: fp_jax.parse_f32_chunks_v2(p, L, E1, E2), pay_c)
cmp("parse.bcodes", pb_t, pb_c)
cmp("parse.xors", px_t, px_c)

# stage 4: replay from CPU-gold (bcodes, xors) — Pallas on TPU, scan on CPU
rv_t = on(tpu, lambda b, q: fp_jax.replay_f32_chunks(b, q, E1, E2), pb_c, px_c)
rv_c = on(cpu, lambda b, q: fp_jax.replay_f32_chunks(b, q, E1, E2), pb_c, px_c)
cmp("replay(values)", rv_t, rv_c)
cmp("replay_vs_input", rv_t, x_np)

# stage 4b: replay on TPU with Pallas disabled (pure XLA scan on TPU)
os.environ["TRICO_TPU_PALLAS"] = "0"
rv_t2 = on(tpu, lambda b, q: fp_jax._replay_impl(b, q, E1, E2), pb_c, px_c)
cmp("replay_xla_scan_tpu(values)", rv_t2, rv_c)
del os.environ["TRICO_TPU_PALLAS"]

# end-to-end
e_t = on(tpu, lambda v: fp_jax.decode_f32_chunks_v2(
    fp_jax.encode_f32_chunks_v2(v, E1, E2)[0], L, E1, E2), x_np)
cmp("e2e_tpu", e_t, x_np)
print("done", flush=True)
