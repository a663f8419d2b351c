"""Per-stage TPU throughput: predict(sort) / pack / parse / replay / e2e.

GB/s measured on raw value bytes (4 bytes/value), device-resident timing.
"""
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("TRICO_TPU_SCAN_UNROLL", "8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trico_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from trico_tpu.codec import fp_jax, fp_pallas

C = int(os.environ.get("BENCH_C", "2048"))
L = int(os.environ.get("BENCH_L", "4096"))
E1, E2 = 4, 8
REPS = int(os.environ.get("BENCH_REPS", "10"))
print(f"backend={jax.default_backend()} C={C} L={L} reps={REPS}", flush=True)
_ = int(jnp.zeros((1,), jnp.int32)[0])

r = np.random.default_rng(0)
N = C * L
t = np.linspace(0, 500 * np.pi, N)
vals = (np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, N))).astype(np.float32)
x = jnp.asarray(vals.view(np.uint32).reshape(C, L))
GB = N * 4 / 1e9


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {GB / dt:.2f} GB/s ({dt * 1e3:.1f} ms)", flush=True)
    return out


bc, res = bench("predict(sort)", lambda v: fp_jax.predict_f32_chunks(v, E1, E2), x)
pay, sz = bench("pack_v2", lambda b, q: fp_jax.pack_f32_chunks_v2(b, q, E1, E2),
                bc, res)
bench("encode_v2 (predict+pack)",
      lambda v: fp_jax.encode_f32_chunks_v2(v, E1, E2), x)
bench("encode_v2_adaptive", fp_jax.encode_f32_chunks_v2_adaptive, x)
pb, px = bench("parse_v2", lambda p: fp_jax.parse_f32_chunks_v2(p, L, E1, E2), pay)
bench("replay(pallas)", lambda b, q: fp_pallas.replay_pallas(b, q, E1, E2, False),
      pb, px)
os.environ["TRICO_TPU_PALLAS"] = "0"
bench("replay(xla-scan)",
      jax.jit(lambda b, q: fp_jax._replay_impl(b, q, E1, E2)), pb, px)
os.environ.pop("TRICO_TPU_PALLAS")
dec = bench("decode_v2 (parse+replay)",
            lambda p: fp_jax.decode_f32_chunks_v2(p, L, E1, E2), pay)
print("e2e exact:", int(jnp.sum((dec != x).astype(jnp.int32))) == 0, flush=True)
print("done", flush=True)
