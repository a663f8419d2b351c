"""TPU size scan at L=4096: find the exact-C envelope and the failing stage."""
import os
import sys
from pathlib import Path

os.environ.setdefault("TRICO_TPU_SCAN_UNROLL", "8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trico_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from trico_tpu.codec import fp_jax

L = int(os.environ.get("SCAN_L", "4096"))
E1, E2 = 4, 8
print(f"backend={jax.default_backend()} L={L} "
      f"row_block={fp_jax._row_block(L)}", flush=True)
_ = int(jnp.zeros((1,), jnp.int32)[0])

r = np.random.default_rng(0)
for C in (64, 256, 512, 1024, 2048):
    N = C * L
    t = np.linspace(0, 500 * np.pi, N)
    vals = (np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, N))).astype(np.float32)
    x = jnp.asarray(vals.view(np.uint32).reshape(C, L))
    bc, res = fp_jax.predict_f32_chunks(x, E1, E2)
    pay, sz = fp_jax.pack_f32_chunks_v2(bc, res, E1, E2)
    pb, px = fp_jax.parse_f32_chunks_v2(pay, L, E1, E2)
    v = fp_jax.replay_f32_chunks(pb, px, E1, E2)
    n_parse = int(jnp.sum((pb != bc).astype(jnp.int32))
                  + jnp.sum((px != res).astype(jnp.int32)))
    n_e2e = int(jnp.sum((v != x).astype(jnp.int32)))
    # replay correctness independent of parse: replay gold (bc,res)
    v2 = fp_jax.replay_f32_chunks(bc, res, E1, E2)
    n_replay = int(jnp.sum((v2 != x).astype(jnp.int32)))
    print(f"C={C}: parse-vs-gold={n_parse} e2e={n_e2e} "
          f"replay-gold-vs-input={n_replay}", flush=True)
    if n_e2e and not n_parse and n_replay:
        break
print("done", flush=True)
