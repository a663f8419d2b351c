"""Multi-chip (device-mesh) data-parallel mesh compression.

The reference is single-threaded C; this module is the scale-out design the
reference never had (SURVEY.md §2 "Parallelism & distributed communication").

Parallel axes of the problem:

* **chunks** (the DP axis): every attribute stream is split into fixed-length
  chunks with independent predictor state (trico_tpu/chunked.py), sharded
  across devices with ``shard_map`` — encode/decode need no cross-chunk
  communication at all.
* **planes** (the "TP-like" axis): x/y/z (and u/v) substreams are independent
  codec instances; they ride a leading vmap dimension inside each shard.
* **archive assembly** (the collective part): compressed chunk sizes are
  data-dependent, so the deterministic archive layout requires a size
  all-gather + exclusive scan for offsets; payload bytes are then gathered in
  chunk order (host-side concatenation per stream). On a real pod slice the
  all-gather rides ICI; across hosts the byte gather goes over DCN via
  ``multihost_utils`` (the framing keeps archive order == chunk order, so the
  result is bit-deterministic regardless of device count).

Works identically on one chip, a virtual CPU mesh (tests /
``__graft_entry__.dryrun_multichip``), or a pod slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codec import fp_jax


def make_mesh(n_devices: int | None = None, axis: str = "chunks") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@functools.partial(jax.jit, static_argnums=(1, 2, 3), static_argnames=("mesh",))
def _sharded_encode(values, e1, e2, n_planes, mesh):
    """values: (n_planes, C, L) uint32 sharded on C → (payloads, sizes, offsets).

    The per-plane, per-chunk encode is communication-free; the offset
    computation is the collective (an all-gather of sizes + exclusive scan),
    expressed through sharding constraints so XLA inserts the collectives.
    """
    spec = NamedSharding(mesh, P(None, "chunks", None))
    values = jax.lax.with_sharding_constraint(values, spec)
    # v2 tpu-layout payloads: encode AND decode are gather-free on device
    enc = lambda v: fp_jax.encode_f32_chunks_v2(v, e1, e2)
    payloads, sizes = jax.vmap(enc)(values)  # (p, C, B), (p, C)
    # deterministic archive layout: exclusive scan of sizes in (plane, chunk)
    # order — replicated result, so every device knows every offset
    flat = sizes.reshape(-1).astype(jnp.int32)
    offsets = jnp.cumsum(flat) - flat
    offsets = jax.lax.with_sharding_constraint(
        offsets, NamedSharding(mesh, P(None))
    )
    return payloads, sizes, offsets.reshape(sizes.shape)


def encode_planes(planes: np.ndarray, chunk_len: int = 4096, e1: int = 4,
                  e2: int = 10, mesh: Mesh | None = None):
    """Encode (n_planes, N) uint32 planes data-parallel over the mesh.

    Returns (payloads (p, C, B) np.uint8, sizes (p, C), offsets (p, C), tails)
    — `tails` are the per-plane remainders for the host codec.
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    p, N = planes.shape
    # chunk count per plane, padded so the chunk axis divides the mesh
    C = N // chunk_len
    tails = [planes[i, C * chunk_len :] for i in range(p)]
    Cp = max(((C + n_dev - 1) // n_dev) * n_dev, n_dev)
    vals = np.zeros((p, Cp, chunk_len), dtype=np.uint32)
    if C:
        vals[:, :C] = planes[:, : C * chunk_len].reshape(p, C, chunk_len)
    payloads, sizes, offsets = _sharded_encode(jnp.asarray(vals), e1, e2, p, mesh=mesh)
    return (
        np.asarray(payloads)[:, :C],
        np.asarray(sizes)[:, :C],
        np.asarray(offsets)[:, :C],
        tails,
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3), static_argnames=("mesh",))
def _sharded_decode(payloads, L, e1, e2, mesh):
    spec = NamedSharding(mesh, P(None, "chunks", None))
    payloads = jax.lax.with_sharding_constraint(payloads, spec)
    dec = lambda pl: fp_jax.decode_f32_chunks_v2(pl, L, e1, e2)
    return jax.vmap(dec)(payloads)


def roundtrip_step(values, chunk_len: int, mesh: Mesh, e1: int = 4, e2: int = 10):
    """The full distributed pipeline as one jittable step (used by the
    multichip dryrun): sharded encode → offsets (collective) → sharded decode
    → bit-exactness check against the input.

    values: (n_planes, C, L) uint32.
    """
    payloads, sizes, offsets = _sharded_encode(values, e1, e2, values.shape[0], mesh=mesh)
    decoded = _sharded_decode(payloads, values.shape[2], e1, e2, mesh=mesh)
    exact = jnp.all(decoded == values)
    total_bytes = jnp.sum(sizes.astype(jnp.int32))
    return exact, total_bytes, offsets
