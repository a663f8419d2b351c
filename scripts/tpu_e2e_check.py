"""Production-path exactness check on the real TPU at bench scale.

Runs encode_f32_chunks_v2 -> decode_f32_chunks_v2 (fixed exponents) and the
adaptive encoder at C=8192/L=1024 and C=2048/L=4096 (production chunk_len),
counting mismatches on device (one scalar D2H per case).
"""
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

print(f"backend={jax.default_backend()} "
      f"row_block(1024)={fp_jax._row_block(1024)} "
      f"row_block(4096)={fp_jax._row_block(4096)}", flush=True)
_ = int(jnp.zeros((1,), jnp.int32)[0])

NMAX = 8 * 1024 * 1024
r = np.random.default_rng(0)
t = np.linspace(0, 500 * np.pi, NMAX)
vals = (np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, NMAX))).astype(np.float32)
raw = vals.view(np.uint32)

for C, L in ((8192, 1024), (2048, 4096)):
    x = jnp.asarray(raw[: C * L].reshape(C, L))
    pay, sz = fp_jax.encode_f32_chunks_v2(x, 4, 8)
    dec = fp_jax.decode_f32_chunks_v2(pay, L, 4, 8)
    n_fixed = int(jnp.sum((dec != x).astype(jnp.int32)))
    pay_a, sz_a = fp_jax.encode_f32_chunks_v2_adaptive(x)
    # adaptive: decode per hash_info group (the production decode behavior)
    infos = pay_a[:, 0]
    n_adapt = 0
    total_a = int(jnp.sum(sz_a))
    for e1, e2 in fp_jax.F32_TPU_CANDIDATES:
        hi = ((e1 >> 1) << 4) | (e2 >> 1)
        m = infos == hi
        cnt = int(jnp.sum(m.astype(jnp.int32)))
        if cnt == 0:
            continue
        # decode ALL rows with these exponents but only count matching rows
        dec_a = fp_jax.decode_f32_chunks_v2(pay_a, L, e1, e2)
        n_adapt += int(jnp.sum(jnp.where(m[:, None], dec_a != x, False)
                               .astype(jnp.int32)))
    print(f"C={C} L={L}: fixed e2e mismatches={n_fixed}, "
          f"adaptive e2e mismatches={n_adapt}, "
          f"adaptive bytes={total_a} fixed bytes={int(jnp.sum(sz))}", flush=True)
print("done", flush=True)
