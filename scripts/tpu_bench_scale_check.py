#!/usr/bin/env python
"""Exactness check at round-1 bench scale (n=8M, chunk 1024, C=8192) on TPU."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
from trico_tpu.codec import fp_jax

n_values, L = 8 * 1024 * 1024, 1024
r = np.random.default_rng(0)
t = np.linspace(0, 500 * np.pi, n_values)
vals = (np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, n_values))).astype(np.float32)
raw = vals.view(np.uint32)
C = n_values // L
x = jnp.asarray(raw.reshape(C, L))
payloads, sizes = fp_jax.encode_f32_chunks_v2(x, 4, 8)
jax.block_until_ready(payloads)
print("encoded", flush=True)
dec = fp_jax.decode_f32_chunks_v2(payloads, L, 4, 8)
exact = bool(jnp.all(dec == x))
print("composite exact:", exact, flush=True)
if not exact:
    # localize: which stage?
    bc, res = fp_jax.predict_f32_chunks(x, 4, 8)
    bc2, xors2 = fp_jax.parse_f32_chunks_v2(payloads, L, 4, 8)
    print("parse bcode match:", bool(jnp.all(bc2 == bc)), flush=True)
    print("parse xors match:", bool(jnp.all(xors2 == res)), flush=True)
    vals2 = fp_jax.replay_f32_chunks(bc, res, 4, 8)
    print("replay(direct) exact:", bool(jnp.all(vals2 == x)), flush=True)
    bad = jnp.argwhere(dec != x)
    bad = np.asarray(bad[:5])
    print("first bad (chunk,pos):", bad, flush=True)
