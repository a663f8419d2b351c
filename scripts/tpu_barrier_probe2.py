"""Second-round barrier probe: which recomputed value breaks the fused parse?"""
import os
import sys
from pathlib import Path

os.environ.setdefault("TRICO_TPU_SCAN_UNROLL", "8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trico_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from trico_tpu.codec import fp_jax
from trico_tpu.codec.fp_jax import _compact_monotone, _expand_monotone, _glen32

L = 1024
E1, E2 = 4, 8
C = int(os.environ.get("BISECT_C", "8192"))
print(f"backend={jax.default_backend()} C={C} L={L}", flush=True)
_ = int(jnp.zeros((1,), jnp.int32)[0])

r = np.random.default_rng(0)
N = C * L
t = np.linspace(0, 500 * np.pi, N)
vals = (np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, N))).astype(np.float32)
x = jnp.asarray(vals.view(np.uint32).reshape(C, L))
bc_g, res_g = fp_jax.predict_f32_chunks(x, E1, E2)
pay, _sz = fp_jax.pack_f32_chunks_v2(bc_g, res_g, E1, E2)
jax.block_until_ready((pay, bc_g, res_g))
print("payloads ready", flush=True)


def parse_b(payloads, L, b):
    """b: set of barrier point names."""
    def bar(name, v):
        return jax.lax.optimization_barrier(v) if name in b else v

    C, B = payloads.shape
    G = L // 8
    S = 4 * L
    tags = payloads[:, 5 : 5 + 3 * G].astype(jnp.uint32).reshape(C, G, 3)
    tag24 = (tags[:, :, 0] << 16) | (tags[:, :, 1] << 8) | tags[:, :, 2]
    shifts = (3 * jnp.arange(8, dtype=jnp.uint32)).reshape(1, 1, 8)
    bcodes = ((tag24[:, :, None] >> shifts) & 7).astype(jnp.int32).reshape(C, L)
    lens = bar("lens", _glen32(bcodes))
    cum = bar("cum", jnp.cumsum(lens, axis=1))
    res_before = cum - lens
    n_res = cum[:, -1]
    k = jnp.arange(4, dtype=jnp.int32)[None, None, :]
    valid = bar("valid", (k < lens[:, :, None]).reshape(C, S))
    sbits = max(S - 1, 1).bit_length()
    i = jnp.arange(L, dtype=jnp.int32)[None, :, None]
    move = bar("move", jnp.broadcast_to(
        4 * i - res_before[:, :, None], (C, L, 4)).reshape(C, S))
    slot_id = jnp.broadcast_to(jnp.arange(S, dtype=jnp.uint32).reshape(1, S), (C, S))
    slot_by_rank = bar("sbr", _compact_monotone(slot_id, move, valid, sbits).astype(jnp.int32))
    region = payloads[:, 5 + 3 * G : 5 + 3 * G + S].astype(jnp.uint32)
    ranks = jnp.arange(S, dtype=jnp.int32)[None, :]
    bytes_by_slot = bar("bbs", _expand_monotone(
        region, slot_by_rank - ranks, ranks < n_res[:, None], 8
    )).reshape(C, L, 4)
    shift = (8 * jnp.clip(lens[:, :, None] - 1 - k, 0, 3)).astype(jnp.uint32)
    xors = jnp.sum(
        jnp.where(valid.reshape(C, L, 4), bytes_by_slot << shift, 0), axis=2
    ).astype(jnp.uint32)
    return bcodes.astype(jnp.uint8), xors


VARIANTS = [
    frozenset({"sbr", "bbs"}),
    frozenset({"lens"}),
    frozenset({"lens", "bbs"}),
    frozenset({"lens", "cum", "valid", "move", "sbr", "bbs"}),
]
for b in VARIANTS:
    f = jax.jit(functools.partial(parse_b, b=b), static_argnums=(1,))
    pb, px = f(pay, L)
    n = int(jnp.sum((pb != bc_g).astype(jnp.int32))
            + jnp.sum((px != res_g).astype(jnp.int32)))
    print(f"barriers={sorted(b)}: {n} mismatches", flush=True)
print("done", flush=True)
