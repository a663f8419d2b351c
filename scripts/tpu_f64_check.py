"""f64 production-path check on the real TPU.

Encode on device with the reference default (20,20) exponents (sort-based
closed-form predictor — table-size independent), decode through
chunked.decode_chunked (threaded native host decode for the 2^20-entry
tables), and compare bit-exactly. Also times the device encode.
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

from trico_tpu import chunked

print(f"backend={jax.default_backend()}", flush=True)
_ = int(jnp.zeros((1,), jnp.int32)[0])

N = 2 * 1024 * 1024
r = np.random.default_rng(0)
t = np.linspace(0, 500 * np.pi, N)
vals = (np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, N))).astype(np.float64)
raw = vals.view(np.uint64)

t0 = time.perf_counter()
blob = chunked.encode_chunked(raw, chunk_len=4096, layout="tpu")
t1 = time.perf_counter()
out, bits = chunked.decode_chunked(blob)
t2 = time.perf_counter()
print(f"encode {N * 8 / 1e9 / (t1 - t0):.2f} GB/s (incl compile+host), "
      f"decode {N * 8 / 1e9 / (t2 - t1):.2f} GB/s", flush=True)
print(f"bits={bits} exact={np.array_equal(out, raw)} "
      f"ratio={N * 8 / len(blob):.3f}", flush=True)

# steady-state encode timing (second run, compile cached)
t0 = time.perf_counter()
blob2 = chunked.encode_chunked(raw, chunk_len=4096, layout="tpu")
t1 = time.perf_counter()
out2, _ = chunked.decode_chunked(blob2)
t2 = time.perf_counter()
print(f"steady: encode {N * 8 / 1e9 / (t1 - t0):.2f} GB/s, "
      f"decode {N * 8 / 1e9 / (t2 - t1):.2f} GB/s, "
      f"exact={np.array_equal(out2, raw)}", flush=True)
print("done", flush=True)
