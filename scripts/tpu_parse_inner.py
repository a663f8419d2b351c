"""Instrument parse_f32_chunks_v2 internals at C=8192: full vs sliced, on device."""
import os
import sys
from pathlib import Path

os.environ.setdefault("TRICO_TPU_SCAN_UNROLL", "8")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from trico_tpu.codec import fp_jax
from trico_tpu.codec.fp_jax import (_compact_monotone, _expand_monotone,
                                    _glen32, _logshift_passes)

L = 1024
E1, E2 = 4, 8
C = int(os.environ.get("BISECT_C", "8192"))
CS = 1024
print(f"backend={jax.default_backend()} C={C} L={L}", flush=True)
_ = int(jnp.zeros((1,), jnp.int32)[0])

r = np.random.default_rng(0)
N = C * L
t = np.linspace(0, 500 * np.pi, N)
vals = (np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, N))).astype(np.float32)
x = jnp.asarray(vals.view(np.uint32).reshape(C, L))
pay, _sz = fp_jax.pack_f32_chunks_v2(*fp_jax.predict_f32_chunks(x, E1, E2), E1, E2)
jax.block_until_ready(pay)
print("payloads ready", flush=True)


@functools.partial(jax.jit, static_argnums=(1,))
def parse_steps(payloads, L):
    """Return the parse intermediates (same code path as parse_f32_chunks_v2)."""
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
        region, slot_by_rank - ranks, ranks < n_res[:, None], 8
    )
    return cum, move, slot_by_rank, bytes_by_slot


full = parse_steps(pay, L)
names = ["cum", "move", "slot_by_rank", "bytes_by_slot"]
counts = []
firsts = []
for i in range(0, C, CS):
    part = parse_steps(pay[i : i + CS], L)
    for j, (f, p) in enumerate(zip(full, part)):
        d = jnp.sum((f[i : i + CS] != p).astype(jnp.int32))
        counts.append(d)
out = np.asarray(jnp.stack(counts)).reshape(C // CS, len(names))
for j, n in enumerate(names):
    tot = out[:, j].sum()
    print(f"{n}: {tot} mismatches across slices {np.nonzero(out[:, j])[0]}", flush=True)

# first mismatching (row, col) of slot_by_rank full-vs-sliced, plus values
sbr_f = full[2]
mism_meta = []
for i in range(0, C, CS):
    part = parse_steps(pay[i : i + CS], L)
    neq = sbr_f[i : i + CS] != part[2]
    anyrow = jnp.any(neq, axis=1)
    has = jnp.any(anyrow)
    frow = jnp.argmax(anyrow)
    fcol = jnp.argmax(neq[frow])
    mism_meta.append(jnp.stack([
        has.astype(jnp.int32), frow.astype(jnp.int32) + i, fcol.astype(jnp.int32),
        sbr_f[frow + i, fcol], part[2][frow, fcol],
    ]))
meta = np.asarray(jnp.stack(mism_meta))
for row in meta:
    if row[0]:
        print(f"slot_by_rank first mismatch: row {row[1]} col {row[2]}: "
              f"full={row[3]} sliced={row[4]}", flush=True)
        break
print("done", flush=True)
