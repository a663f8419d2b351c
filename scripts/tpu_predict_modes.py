"""Compare predict backends on TPU: sort vs pallas — exactness at scale + GB/s."""
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

print(f"backend={jax.default_backend()}", flush=True)
_ = int(jnp.zeros((1,), jnp.int32)[0])
REPS = 10

r = np.random.default_rng(0)
NMAX = 8 * 1024 * 1024
t = np.linspace(0, 500 * np.pi, NMAX)
vals = (np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, NMAX))).astype(np.float32)
raw = vals.view(np.uint32)

for C, L in ((2048, 4096), (8192, 1024)):
    x = jnp.asarray(raw[: C * L].reshape(C, L))
    GB = C * L * 4 / 1e9
    for e1, e2 in ((4, 8), (4, 10)):
        bs, rs = fp_jax.predict_f32_chunks_sort(x, e1, e2)
        xp1, xp2 = fp_pallas.predict_xors_pallas(x, e1, e2, False)
        bp, rp = fp_jax._bcode_res_from_xors(xp1, xp2)
        n = int(jnp.sum((bs != bp).astype(jnp.int32))
                + jnp.sum((rs != rp).astype(jnp.int32)))
        print(f"C={C} L={L} e=({e1},{e2}): pallas-vs-sort mismatches={n}",
              flush=True)
        for name, fn in (
            ("sort", lambda: fp_jax.predict_f32_chunks_sort(x, e1, e2)),
            ("pallas", lambda: fp_pallas.predict_xors_pallas(x, e1, e2, False)),
        ):
            out = fn()
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / REPS
            print(f"  predict[{name}]: {GB / dt:.2f} GB/s ({dt * 1e3:.1f} ms)",
                  flush=True)
print("done", flush=True)
