"""Measure the windowed Pallas encode predictor on the real TPU.

Scans TRICO_TPU_PALLAS_WINDOW over K in {0 (old 1-step scan), 4, 8, 16, 32}
at the production shape (L=4096) and reports predict-pass GB/s and full
encode GB/s, asserting bit-exact round-trip at every K (VERDICT r4 #5).

Run alone (one TPU process at a time!):  python scripts/tpu_window_scan.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

L = int(os.environ.get("W_L", "4096"))
C = int(os.environ.get("W_C", str(4096)))  # 64 MB of u32
E1, E2 = 4, 6


def main():
    from trico_tpu.codec import fp_jax, fp_pallas

    key = jax.random.PRNGKey(0)
    v = (jnp.cumsum(jax.random.normal(key, (C * L,), jnp.float32) * 1e-3)
         + jnp.sin(jnp.linspace(0.0, 2000.0, C * L)) * 8)
    x = jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.uint32)
    x = x.reshape(C, L)
    nbytes = C * L * 4
    print(f"shape ({C}, {L}) = {nbytes/1e6:.0f} MB, exps ({E1},{E2})",
          flush=True)

    ref = None
    for K in (0, 4, 8, 16, 32):
        os.environ["TRICO_TPU_PALLAS_WINDOW"] = str(K)
        # encode_f32_chunks_v2 resolves the window inside its jit trace, so
        # the env change alone would re-run the first K's cached program —
        # drop compiled programs to force an honest re-trace per K
        jax.clear_caches()
        # predict pass alone
        out = fp_pallas.predict_xors_pallas(x, E1, E2)
        jax.block_until_ready(out)
        reps = max(5, int(1.5e9 // nbytes) + 1)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fp_pallas.predict_xors_pallas(x, E1, E2)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        if ref is None:
            ref = [jnp.asarray(o).copy() for o in out]
            exact = True
        else:
            exact = all(bool(jnp.all(a == b)) for a, b in zip(ref, out))
        # full encode
        pay, sz = fp_jax.encode_f32_chunks_v2(x, E1, E2)
        jax.block_until_ready((pay, sz))
        t0 = time.perf_counter()
        for _ in range(reps):
            pay, sz = fp_jax.encode_f32_chunks_v2(x, E1, E2)
        jax.block_until_ready((pay, sz))
        edt = (time.perf_counter() - t0) / reps
        dec = fp_jax.decode_f32_chunks_v2(pay, L, E1, E2)
        rt = bool(jnp.all(dec == x))
        print(f"K={K:>2}: predict {nbytes/1e9/dt:6.2f} GB/s  "
              f"encode {nbytes/1e9/edt:6.2f} GB/s  "
              f"xors_match={exact}  roundtrip={rt}", flush=True)


if __name__ == "__main__":
    main()
