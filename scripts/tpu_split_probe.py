"""Probe: does splitting parse into two jit programs (or lax.map row-blocking)
make it exact at C=8192 on TPU?"""
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


@functools.partial(jax.jit, static_argnums=(1,))
def stage_a(payloads, L):
    C, B = payloads.shape
    G = L // 8
    S = 4 * L
    tags = payloads[:, 5 : 5 + 3 * G].astype(jnp.uint32).reshape(C, G, 3)
    tag24 = (tags[:, :, 0] << 16) | (tags[:, :, 1] << 8) | tags[:, :, 2]
    shifts = (3 * jnp.arange(8, dtype=jnp.uint32)).reshape(1, 1, 8)
    bcodes = ((tag24[:, :, None] >> shifts) & 7).astype(jnp.int32).reshape(C, L)
    lens = _glen32(bcodes)
    cum = jnp.cumsum(lens, axis=1)
    res_before = cum - lens
    n_res = cum[:, -1]
    k = jnp.arange(4, dtype=jnp.int32)[None, None, :]
    valid = (k < lens[:, :, None]).reshape(C, S)
    sbits = max(S - 1, 1).bit_length()
    i = jnp.arange(L, dtype=jnp.int32)[None, :, None]
    move = jnp.broadcast_to(4 * i - res_before[:, :, None], (C, L, 4)).reshape(C, S)
    slot_id = jnp.broadcast_to(jnp.arange(S, dtype=jnp.uint32).reshape(1, S), (C, S))
    slot_by_rank = _compact_monotone(slot_id, move, valid, sbits).astype(jnp.int32)
    region = payloads[:, 5 + 3 * G : 5 + 3 * G + S].astype(jnp.uint32)
    ranks = jnp.arange(S, dtype=jnp.int32)[None, :]
    bytes_by_slot = _expand_monotone(
        region, slot_by_rank - ranks, ranks < n_res[:, None], 8)
    return bcodes, lens, bytes_by_slot


@functools.partial(jax.jit, static_argnums=(3,))
def stage_b(bcodes, lens, bytes_by_slot, L):
    C = bcodes.shape[0]
    k = jnp.arange(4, dtype=jnp.int32)[None, None, :]
    valid = k < lens[:, :, None]
    shift = (8 * jnp.clip(lens[:, :, None] - 1 - k, 0, 3)).astype(jnp.uint32)
    b = bytes_by_slot.reshape(C, L, 4)
    xors = jnp.sum(jnp.where(valid, b << shift, 0), axis=2).astype(jnp.uint32)
    return bcodes.astype(jnp.uint8), xors


bcodes, lens, bbs = stage_a(pay, L)
pb, px = stage_b(bcodes, lens, bbs, L)
n = int(jnp.sum((pb != bc_g).astype(jnp.int32)) + jnp.sum((px != res_g).astype(jnp.int32)))
print(f"two-program split: {n} mismatches", flush=True)


@functools.partial(jax.jit, static_argnums=(1, 2))
def parse_blocked(payloads, L, block):
    C = payloads.shape[0]
    mat = payloads.reshape(C // block, block, payloads.shape[1])
    pb, px = jax.lax.map(
        lambda m: fp_jax.parse_f32_chunks_v2(m, L, E1, E2), mat)
    return pb.reshape(C, L), px.reshape(C, L)


for block in (1024, 2048):
    pb, px = parse_blocked(pay, L, block)
    n = int(jnp.sum((pb != bc_g).astype(jnp.int32))
            + jnp.sum((px != res_g).astype(jnp.int32)))
    print(f"lax.map block={block}: {n} mismatches", flush=True)
print("done", flush=True)
