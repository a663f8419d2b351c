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

import contextlib
import functools
import struct

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codec import bp_jax, fp64_jax, fp_jax


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


# ---------------------------------------------------------------------------
# mesh → archive bytes: the distributed product (reference archive assembly
# semantics: trico/trico.c:126-213, one [size][payload] substream per plane)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 2),
                   static_argnames=("mesh", "cands"))
def _shardmap_encode_f32(values, e1, e2, mesh, cands=None):
    """shard_map encode: (p, Cp, L) uint32, chunk axis sharded over the mesh.

    Each device encodes only its local chunks (communication-free); the
    per-chunk compressed sizes are all-gathered over the `chunks` axis (ICI)
    and exclusive-scanned so every device holds the deterministic archive
    offsets. Returns (payloads sharded, sizes sharded, offsets replicated).
    Pass ``e1=None`` for adaptive per-chunk exponents (the production
    default, matching ``ArchiveWriter(chunk_len=...)``).
    """

    def local(vals):
        if e1 is None:
            cc = cands or fp_jax.F32_TPU_CANDIDATES
            enc = lambda v: fp_jax.encode_f32_chunks_v2_adaptive(v, cc)
        else:
            enc = lambda v: fp_jax.encode_f32_chunks_v2(v, e1, e2)
        payloads, sizes = jax.vmap(enc)(vals)  # (p, C_loc, B), (p, C_loc)
        # every device learns every chunk's size (one ICI all-gather), then
        # exclusive-scans in (plane, chunk) order for deterministic archive
        # offsets; each device returns its own chunks' offsets
        all_sizes = jax.lax.all_gather(sizes, "chunks", axis=1, tiled=True)
        flat = all_sizes.reshape(-1).astype(jnp.int32)
        offs = (jnp.cumsum(flat) - flat).reshape(all_sizes.shape)
        C_loc = sizes.shape[1]
        idx = jax.lax.axis_index("chunks")
        offs_local = jax.lax.dynamic_slice_in_dim(offs, idx * C_loc, C_loc, axis=1)
        return payloads, sizes, offs_local

    # check_vma=False: the per-shard encode dispatches to Pallas kernels whose
    # pallas_call out_shape ShapeDtypeStructs carry no vma annotation; JAX's
    # varying-mesh-axis checker rejects those inside shard_map on real TPUs
    # (ADVICE r2 high). The body is communication-free except the explicit
    # all_gather, so the vma check adds no safety here.
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, "chunks", None),
        out_specs=(P(None, "chunks", None), P(None, "chunks"), P(None, "chunks")),
        check_vma=False,
    )(values)


@functools.partial(jax.jit, static_argnums=(2, 3),
                   static_argnames=("mesh", "cands"))
def _shardmap_encode_f64(hi, lo, e1, e2, mesh, cands=None):
    """shard_map f64 encode: (p, Cp, L) hi/lo uint32 words, chunks sharded.

    Same collective shape as :func:`_shardmap_encode_f32` (reference f64
    codec: floating_point_stream_compression.c:576-1164; doubles are carried
    as (hi, lo) word pairs — TPUs have no native 64-bit integer path).
    Pass ``e1=None`` for adaptive per-chunk exponents
    (``fp64_jax.F64_TPU_CANDIDATES``, the production default)."""

    def local(h, l):
        if e1 is None:
            cc = cands or fp64_jax.F64_TPU_CANDIDATES
            enc = lambda hh, ll: fp64_jax.encode_f64_chunks_v2_adaptive(hh, ll, cc)
        else:
            enc = lambda hh, ll: fp64_jax.encode_f64_chunks_v2(hh, ll, e1, e2)
        payloads, sizes = jax.vmap(enc)(h, l)
        all_sizes = jax.lax.all_gather(sizes, "chunks", axis=1, tiled=True)
        flat = all_sizes.reshape(-1).astype(jnp.int32)
        offs = (jnp.cumsum(flat) - flat).reshape(all_sizes.shape)
        C_loc = sizes.shape[1]
        idx = jax.lax.axis_index("chunks")
        offs_local = jax.lax.dynamic_slice_in_dim(offs, idx * C_loc, C_loc, axis=1)
        return payloads, sizes, offs_local

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, "chunks", None), P(None, "chunks", None)),
        out_specs=(P(None, "chunks", None), P(None, "chunks"), P(None, "chunks")),
        check_vma=False,  # Pallas out_shapes carry no vma; see _shardmap_encode_f32
    )(hi, lo)


def _gather_to_host(x) -> np.ndarray:
    """Fetch a (possibly multi-host sharded) array fully to this host.

    Within one process ``np.asarray`` suffices; across processes the byte
    gather rides DCN via ``multihost_utils.process_allgather`` (exercised by
    tests/test_multiprocess.py on a 2-process localhost Gloo backend)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _put_sharded(arr: np.ndarray, mesh: Mesh, spec: P):
    """Host array (replicated on every process) → globally-sharded device array.

    ``jax.device_put`` with a multi-process ``NamedSharding`` places only the
    addressable shards on each process, so the shard_map encode/decode below
    works identically on one process, a virtual CPU mesh, or a multi-host pod
    (every process holds the full host copy; only its shards hit its devices).
    """
    return jax.device_put(arr, NamedSharding(mesh, spec))


class _NullTimer:
    """No-op StageTimer stand-in so the hot path has no conditionals."""

    @staticmethod
    @contextlib.contextmanager
    def stage(name, nbytes=0, sync=None):
        yield


def _f32_plane_containers(planes: np.ndarray, chunk_len: int, mesh: Mesh,
                          optimize: bool | str, prof=None) -> list[bytes]:
    """Sharded-encode (p, N) uint32 planes → one chunked v1 container per plane.

    Full chunks go through the shard_map encode (all-gather size exscan fixes
    the deterministic layout); the final partial chunk is host-coded. Output
    bytes are identical to ``chunked.encode_chunked(..., layout="tpu")``
    regardless of device count. ``prof`` (StageTimer) splits the wall into
    device kernels / host gather / container assembly / tail coding."""
    from .. import chunked as _chunked
    from ..archive import F32_EXP

    prof = prof or _NullTimer()
    e1, e2 = F32_EXP  # matches ArchiveWriter(chunk_len=...) for bit-identity
    n_dev = mesh.devices.size
    p, N = planes.shape
    C = N // chunk_len
    payloads = sizes = None
    if C:
        Cp = max(((C + n_dev - 1) // n_dev) * n_dev, n_dev)
        vals = np.zeros((p, Cp, chunk_len), np.uint32)
        vals[:, :C] = planes[:, : C * chunk_len].reshape(p, C, chunk_len)
        with prof.stage("fp_device_encode", nbytes=vals.nbytes,
                        sync=lambda: (dev_payloads, dev_sizes)):
            dev_payloads, dev_sizes, _ = _shardmap_encode_f32(
                _put_sharded(vals, mesh, P(None, "chunks", None)),
                None if optimize else e1, None if optimize else e2, mesh=mesh,
                cands=(fp_jax.F32_TPU_CANDIDATES_FAST
                       if optimize == "fast" else None),
            )
        with prof.stage("fp_gather", nbytes=vals.nbytes):
            payloads = _gather_to_host(dev_payloads)
            sizes = _gather_to_host(dev_sizes)
    out = []
    for i in range(p):
        # vectorized masked gather (no per-chunk Python loop, VERDICT r3 #4)
        chunk_sizes = [int(s) for s in sizes[i, :C]] if C else []
        with prof.stage("fp_assembly",
                        nbytes=int(sizes[i, :C].sum()) if C else 0):
            body = [_chunked.rows_to_bytes(payloads[i, :C],
                                           sizes[i, :C]).tobytes()] if C else []
        tail = planes[i, C * chunk_len :]
        if len(tail):
            with prof.stage("fp_tails", nbytes=tail.nbytes):
                f32c = (fp_jax.F32_TPU_CANDIDATES_FAST
                        if optimize == "fast" else fp_jax.F32_TPU_CANDIDATES)
                tp = (_chunked._host_fp_encode_best(tail, f32c)
                      if optimize else _chunked._host_fp_encode(tail, e1, e2))
            chunk_sizes.append(len(tp))
            body.append(tp)
        head = struct.pack("<BBIII", 1, 4, chunk_len, N, len(chunk_sizes))
        sizes_blob = struct.pack(f"<{len(chunk_sizes)}I", *chunk_sizes)
        out.append(head + sizes_blob + b"".join(body))
    return out


def _f64_plane_containers(planes: np.ndarray, chunk_len: int, mesh: Mesh,
                          optimize: bool | str = True, prof=None) -> list[bytes]:
    """Sharded-encode (p, N) uint64 planes → one chunked v1 f64 container each.

    Bit-identical to ``chunked.encode_chunked(plane, layout="tpu")`` for any
    device count (flags: bit 0 = f64, bit 2 = tpu layout). ``optimize``
    picks each chunk's exponents from ``fp64_jax.F64_TPU_CANDIDATES`` on
    device (ties go to the VMEM-viable pair, so those chunks decode sharded
    gather-free; (20,20) winners decode on host threads)."""
    from .. import chunked as _chunked
    from ..archive import F64_EXP

    prof = prof or _NullTimer()
    e1, e2 = F64_EXP
    chunk_len = (chunk_len // 2) * 2 or 2
    n_dev = mesh.devices.size
    p, N = planes.shape
    C = N // chunk_len
    payloads = sizes = None
    if C:
        Cp = max(((C + n_dev - 1) // n_dev) * n_dev, n_dev)
        hi = np.zeros((p, Cp, chunk_len), np.uint32)
        lo = np.zeros((p, Cp, chunk_len), np.uint32)
        full = planes[:, : C * chunk_len].reshape(p, C, chunk_len)
        hi[:, :C] = (full >> np.uint64(32)).astype(np.uint32)
        lo[:, :C] = (full & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        with prof.stage("fp_device_encode", nbytes=hi.nbytes + lo.nbytes,
                        sync=lambda: (dev_payloads, dev_sizes)):
            dev_payloads, dev_sizes, _ = _shardmap_encode_f64(
                _put_sharded(hi, mesh, P(None, "chunks", None)),
                _put_sharded(lo, mesh, P(None, "chunks", None)),
                None if optimize else e1, None if optimize else e2, mesh=mesh,
                cands=(fp64_jax.F64_TPU_CANDIDATES_FAST
                       if optimize == "fast" else None))
        with prof.stage("fp_gather", nbytes=hi.nbytes + lo.nbytes):
            payloads = _gather_to_host(dev_payloads)
            sizes = _gather_to_host(dev_sizes)
    out = []
    for i in range(p):
        chunk_sizes = [int(s) for s in sizes[i, :C]] if C else []
        with prof.stage("fp_assembly",
                        nbytes=int(sizes[i, :C].sum()) if C else 0):
            body = [_chunked.rows_to_bytes(payloads[i, :C],
                                           sizes[i, :C]).tobytes()] if C else []
        tail = planes[i, C * chunk_len :]
        if len(tail):
            with prof.stage("fp_tails", nbytes=tail.nbytes):
                f64c = (fp64_jax.F64_TPU_CANDIDATES_FAST
                        if optimize == "fast" else fp64_jax.F64_TPU_CANDIDATES)
                tp = (_chunked._host_fp_encode_best(tail, f64c)
                      if optimize else _chunked._host_fp_encode(tail, e1, e2))
            chunk_sizes.append(len(tp))
            body.append(tp)
        head = struct.pack("<BBIII", 1, 1 | 4, chunk_len, N, len(chunk_sizes))
        sizes_blob = struct.pack(f"<{len(chunk_sizes)}I", *chunk_sizes)
        out.append(head + sizes_blob + b"".join(body))
    return out


def compress_mesh(vertices, triangles=None, *, triangle_normals=None,
                  attributes_uint16=None, vertex_normals=None,
                  vertex_colors=None, uv_per_triangle=None,
                  uv_per_vertex=None, attributes_uint8=None,
                  attributes_uint32=None, attributes_uint64=None,
                  chunk_len: int = 4096, mesh: Mesh | None = None,
                  optimize: bool | str = True, profile=None) -> bytes:
    """Distributed encode of a full mesh into a complete v1 ``.trc`` archive.

    Float vec3/vec2 attributes (vertices — float32 or float64 —, vertex
    normals, per-vertex uvs) are split into coordinate planes (the vmapped
    plane axis), each plane into ``chunk_len``-value chunks sharded over
    ``mesh`` (the DP axis); the collective size-exscan fixes every payload's
    archive offset, and the host concatenates the gathered bytes in chunk
    order — bit-identical output to ``ArchiveWriter(chunk_len=...,
    layout='tpu')`` regardless of device count. Integer streams (triangles
    (m, 3) uint32, vertex colors uint32 rgba) go through the chunked-LZ4
    byte-plane path (independent blocks, threaded host emit). Stream order
    matches the reference encoder tool (trico_encoder/main.c:253-303).

    ``optimize``: True (default) = adaptive per-chunk exponents over the
    full candidate sets; ``"fast"`` = small-table candidates only (every
    chunk stays on the VMEM one-hot kernels and decodes on device — the
    CLI ``--fast`` profile); False = fixed exponents.

    Returns archive bytes decodable by :class:`trico_tpu.archive.ArchiveReader`
    (and by :func:`decompress_mesh` for the sharded decode).
    """
    from .. import chunked as _chunked
    from ..archive import MAGIC, StreamType
    from ..codec import transpose

    if mesh is None:
        mesh = make_mesh()
    prof = profile or _NullTimer()
    chunk_len = (chunk_len // 8) * 8 or 8
    parts: list[bytes] = [struct.pack("<II", MAGIC, 1)]

    def add_fp_stream(st: StreamType, arr, width: int):
        if arr.dtype == np.float64:
            raw = np.ascontiguousarray(arr, np.float64).view(np.uint64)
            planes = np.stack(transpose.aos_to_soa(raw.reshape(-1, width), width))
            containers = _f64_plane_containers(planes, chunk_len, mesh,
                                               optimize, prof)
        else:
            raw = np.ascontiguousarray(arr, np.float32).view(np.uint32)
            planes = np.stack(transpose.aos_to_soa(raw.reshape(-1, width), width))
            containers = _f32_plane_containers(planes, chunk_len, mesh,
                                               optimize, prof)
        parts.append(struct.pack("<BI", int(st), raw.size // width))
        for c in containers:
            parts.append(struct.pack("<I", len(c)))
            parts.append(c)

    def add_lz4_stream(st: StreamType, arr, count: int):
        parts.append(struct.pack("<BI", int(st), count))
        # pick-best integer coding: BP32 (TPU-native bit-plane codec, device
        # encode + sharded gather-free decode) vs LZ4 byte planes — smaller
        # wins, self-describing per substream (chunked.encode_int_best)
        with prof.stage("int_encode", nbytes=arr.nbytes):
            subs = _chunked.encode_int_best(arr)
        for payload in subs:
            parts.append(struct.pack("<I", len(payload)))
            parts.append(payload)

    verts = np.asarray(vertices)
    vst = (StreamType.vertex_double if verts.dtype == np.float64
           else StreamType.vertex_float)
    add_fp_stream(vst, verts, 3)
    if triangles is not None:
        tris = np.asarray(triangles)
        if tris.dtype == np.uint64 or (tris.size and tris.max() >= 2**32):
            tris = np.ascontiguousarray(tris, np.uint64)
            add_lz4_stream(StreamType.triangle_uint64, tris, tris.size // 3)
        else:
            tris = np.ascontiguousarray(tris, np.uint32)
            add_lz4_stream(StreamType.triangle_uint32, tris, tris.size // 3)
    if triangle_normals is not None:
        add_fp_stream(StreamType.triangle_normal_float,
                      np.asarray(triangle_normals, np.float32), 3)
    if attributes_uint16 is not None:
        a = np.ascontiguousarray(attributes_uint16, np.uint16)
        add_lz4_stream(StreamType.attribute_uint16, a, a.size)
    if vertex_normals is not None:
        add_fp_stream(StreamType.vertex_normal_float,
                      np.asarray(vertex_normals, np.float32), 3)
    if vertex_colors is not None:
        colors = np.ascontiguousarray(vertex_colors, np.uint32)
        add_lz4_stream(StreamType.vertex_color, colors, colors.size)
    if uv_per_triangle is not None:
        uvt = np.asarray(uv_per_triangle, np.float32)
        # count semantics follow the reference quirk: uv-per-triangle floats
        # carry 3 uv pairs per triangle (trico.c:577-580)
        add_fp_stream(StreamType.uv_per_triangle_float, uvt, 2)
    if uv_per_vertex is not None:
        add_fp_stream(StreamType.uv_per_vertex_float,
                      np.asarray(uv_per_vertex, np.float32), 2)
    if attributes_uint8 is not None:
        a = np.ascontiguousarray(attributes_uint8, np.uint8)
        add_lz4_stream(StreamType.attribute_uint8, a, a.size)
    if attributes_uint32 is not None:
        a = np.ascontiguousarray(attributes_uint32, np.uint32)
        add_lz4_stream(StreamType.attribute_uint32, a, a.size)
    if attributes_uint64 is not None:
        a = np.ascontiguousarray(attributes_uint64, np.uint64)
        add_lz4_stream(StreamType.attribute_uint64, a, a.size)
    return b"".join(parts)


def decompress_mesh(blob, mesh: Mesh | None = None,
                    route_stats: dict | None = None) -> dict:
    """Distributed decode of a v1 archive produced by :func:`compress_mesh`.

    Walks the self-describing framing on the host, routes every chunked FP
    tpu-layout container (f32 and f64) through :func:`decode_plane_sharded`
    and BP32/64 integer containers through :func:`decode_bp_sharded` (both
    data-parallel, collective-free), LZ4-kind containers through the
    threaded host codec (the LZ4 token walk is sequential by construction —
    lz4.c:1658), and reassembles interleaved arrays. Returns a dict keyed by
    stream name (``vertices``, ``triangles``, ``vertex_normals``,
    ``vertex_colors``, ``uv_per_vertex``, ...).

    ``route_stats`` (optional dict) is filled with per-route substream
    counts: ``sharded_fp`` / ``sharded_bp`` / ``host_lz4`` / ``host_other``
    — the dryrun asserts sharded coverage from it.
    """
    from ..archive import _FP_STREAMS, _LZ4_STREAMS, ArchiveReader, StreamType
    from ..codec import transpose

    if route_stats is None:
        route_stats = {}
    for k in ("sharded_fp", "sharded_bp", "host_lz4", "host_other"):
        route_stats.setdefault(k, 0)
    if mesh is None:
        mesh = make_mesh()
    r = ArchiveReader(blob)
    names = {
        StreamType.vertex_float: "vertices",
        StreamType.vertex_double: "vertices",
        StreamType.triangle_uint32: "triangles",
        StreamType.triangle_uint64: "triangles",
        StreamType.vertex_normal_float: "vertex_normals",
        StreamType.vertex_normal_double: "vertex_normals",
        StreamType.triangle_normal_float: "triangle_normals",
        StreamType.triangle_normal_double: "triangle_normals",
        StreamType.vertex_color: "vertex_colors",
        StreamType.triangle_color: "triangle_colors",
        StreamType.uv_per_vertex_float: "uv_per_vertex",
        StreamType.uv_per_vertex_double: "uv_per_vertex",
        StreamType.uv_per_triangle_float: "uv_per_triangle",
        StreamType.uv_per_triangle_double: "uv_per_triangle",
    }
    from .. import chunked as _chunked

    out: dict = {}
    while r.next_stream_type != StreamType.empty:
        st = r.next_stream_type
        if st in _FP_STREAMS:
            width, bits = _FP_STREAMS[st]
            count = r._read_u32()
            planes = []
            for _ in range(width):
                payload = bytes(r._read_sub())
                # dispatch on the PARSED container header, never raw bytes
                # (r2 VERDICT weak #6): the sharded collective-free decode
                # handles fp-kind tpu-layout containers of either width;
                # everything else (ref layout, LZ4-kind, non-chunked) goes
                # through the chunked host/device codec.
                hdr = _chunked.parse_container_header(payload)
                if (hdr is not None and hdr.kind == "fp"
                        and hdr.layout == "tpu" and hdr.bits == bits):
                    planes.append(decode_plane_sharded(payload, mesh))
                    route_stats["sharded_fp"] += 1
                else:
                    planes.append(_chunked.decode_chunked(payload)[0])
                    route_stats["host_other"] += 1
            for p in planes:
                if len(p) != count:
                    raise ValueError("substream count mismatch")
            ftype = np.float32 if bits == 32 else np.float64
            arr = transpose.soa_to_aos(planes).view(ftype).reshape(-1, width) \
                if width > 1 else planes[0].view(ftype)
            r._advance_stream_type()
            out[names.get(st, st.name)] = arr
        elif st in _LZ4_STREAMS:
            nplanes, dtype, mult = _LZ4_STREAMS[st]
            count = r._read_u32()
            subs = [bytes(r._read_sub()) for _ in range(nplanes)]
            hdr = _chunked.parse_container_header(subs[0]) if subs else None
            if hdr is not None and hdr.kind == "bp":
                # BP32 stream: sharded gather-free decode over the mesh
                arr = decode_bp_sharded(subs[0], mesh).astype(dtype, copy=False)
                route_stats["sharded_bp"] += 1
            else:
                # LZ4 token walk is sequential by nature (lz4.c:1658): blocks
                # decode on host threads (tt_lz4_decompress_blocks)
                planes = [_chunked.decode_lz4_chunked(s) for s in subs]
                arr = (planes[0].view(dtype) if nplanes == 1
                       else transpose.from_byte_planes(planes, dtype))
                route_stats["host_lz4"] += 1
            if len(arr) != count * mult:
                raise ValueError("integer substream count mismatch")
            if mult == 3:
                arr = arr.reshape(-1, 3)
            r._advance_stream_type()
            out[names.get(st, st.name)] = arr
        else:
            st, arr = r.read_stream()
            out[names.get(st, st.name)] = arr
            route_stats["host_other"] += 1
    return out


# Device replay needs (2^e1 + 2^e2)-row one-hot tables in VMEM, and its cost
# is linear in the row count — a 5120-row (10,12) replay measured 0.25 GB/s
# on v5e (fp64_jax candidate notes), well below the threaded host decoder.
# Past this bound the chunks decode on the host instead (same bound as
# chunked.decode_chunked uses). Among the candidate sets this keeps (4,6),
# (0,6) and (4,10) on device and routes (10,12)/(10,16)/(14,18)/(20,20) to
# host threads.
_DEVICE_TABLE_ROWS = 1 << 12


# Cached sharded decode programs. Building `jax.jit(jax.shard_map(lambda ...))`
# inside decode_plane_sharded/decode_bp_sharded gave every call a fresh
# function identity — every decompress_mesh call recompiled all decode
# programs (~2.5 s/program on CPU, 40-60 s through the TPU remote-compile
# tunnel). Module-level jits keyed on the static (chunk_len, exponents, mesh)
# compile once per distinct shape.
@functools.partial(jax.jit, static_argnums=(1, 2, 3), static_argnames=("mesh",))
def _sharded_decode_fp32(sub, chunk_len, e1, e2, mesh):
    dec = jax.shard_map(
        lambda m: fp_jax.decode_f32_chunks_v2(m, chunk_len, e1, e2),
        mesh=mesh, in_specs=P("chunks", None), out_specs=P("chunks", None),
        check_vma=False)  # Pallas out_shapes carry no vma; see above
    return dec(sub)


@functools.partial(jax.jit, static_argnums=(1, 2, 3), static_argnames=("mesh",))
def _sharded_decode_fp64(sub, chunk_len, e1, e2, mesh):
    dec = jax.shard_map(
        lambda m: fp64_jax.decode_f64_chunks_v2(m, chunk_len, e1, e2),
        mesh=mesh, in_specs=P("chunks", None),
        out_specs=(P("chunks", None), P("chunks", None)), check_vma=False)
    return dec(sub)


@functools.partial(jax.jit, static_argnums=(1, 2), static_argnames=("mesh",))
def _sharded_decode_bp(sub, chunk_len, eb, mesh):
    if eb == 4:
        fn = lambda m: bp_jax.decode_bp32_chunks(m, chunk_len)
        specs = P("chunks", None)
    else:
        fn = lambda m: bp_jax.decode_bp64_chunks(m, chunk_len)
        specs = (P("chunks", None), P("chunks", None))
    dec = jax.shard_map(fn, mesh=mesh, in_specs=P("chunks", None),
                        out_specs=specs, check_vma=False)
    return dec(sub)


def decode_plane_sharded(container: bytes, mesh: Mesh | None = None) -> np.ndarray:
    """Collective-free distributed decode of one chunked FP container
    (f32 or f64, tpu layout).

    Host parses the self-describing framing (sizes → offsets), scatters the
    padded payload matrix over the mesh's chunk axis, and every device decodes
    its chunks with zero communication (the v2 layout parse is gather-free).
    Chunks whose self-described exponents exceed the VMEM one-hot bound
    (f64 (20,20) adaptive winners) decode on host threads instead. Returns
    the flat uint32 (f32) or uint64 (f64) raw-bits array.
    """
    from .. import chunked as _chunked
    from .. import native

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    data = bytes(container)
    # bounds-validated framing parse — sizes are untrusted (ADVICE r4 high)
    hdr, sizes, off = _chunked.parse_validated_framing(data)
    if hdr.kind != "fp" or hdr.layout != "tpu":
        raise ValueError("expected a v1 FP tpu-layout chunked container")
    bits, chunk_len, total, n_chunks = (hdr.bits, hdr.chunk_len, hdr.total,
                                        hdr.n_chunks)
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64) + off
    dt = np.uint32 if bits == 32 else np.uint64
    if n_chunks == 0 or total == 0:
        # compress_mesh emits an empty container for 0-element streams
        # (ADVICE r2 medium: n_full went to -1 here); mirror
        # chunked.decode_chunked's early return.
        return np.zeros(total, dt)
    n_full = n_chunks - 1 if total % chunk_len else n_chunks

    out = np.empty(total, dt)
    if n_full:
        B = (fp_jax.f32_max_chunk_bytes(chunk_len) if bits == 32
             else fp64_jax.f64_max_chunk_bytes(chunk_len))
        buf = np.frombuffer(data, np.uint8)
        full_sizes = np.asarray(sizes[:n_full], np.int64)
        mat = _chunked.bytes_to_rows(
            buf[offsets[0] : offsets[n_full]], full_sizes, B)
        out_rows = out[: n_full * chunk_len].reshape(n_full, chunk_len)
        # exponents are self-describing per chunk (adaptive encode): decode
        # each hash_info group with its own static-exponent program
        for hi in np.unique(mat[:, 0]):
            idx = np.nonzero(mat[:, 0] == hi)[0]
            e1 = int(mat[idx[0], 0] >> 4) << 1
            e2 = int(mat[idx[0], 0] & 15) << 1
            Cg = len(idx)
            if (1 << e1) + (1 << e2) > _DEVICE_TABLE_ROWS:
                # host decode for exponents past the device one-hot bound
                # (threaded native when built, per-chunk pure oracle
                # otherwise — ADVICE r4 medium); shared helper with
                # decode_chunked so the two fallbacks cannot drift
                out_rows[idx] = _chunked.host_decode_full_chunks(
                    mat, full_sizes, idx, chunk_len, bits, "tpu")
                continue
            Cp = max(((Cg + n_dev - 1) // n_dev) * n_dev, n_dev)
            sub = np.zeros((Cp, B), np.uint8)
            sub[:Cg] = mat[idx]

            sub_dev = _put_sharded(sub, mesh, P("chunks", None))
            if bits == 32:
                got = _sharded_decode_fp32(sub_dev, chunk_len, e1, e2, mesh=mesh)
            else:
                got = _sharded_decode_fp64(sub_dev, chunk_len, e1, e2, mesh=mesh)
            if bits == 32:
                vals = _gather_to_host(got)[:Cg]
            else:
                vh = _gather_to_host(got[0])[:Cg].astype(np.uint64)
                vl = _gather_to_host(got[1])[:Cg].astype(np.uint64)
                vals = (vh << np.uint64(32)) | vl
            # vectorized scatter of whole chunks (fancy-index rows)
            out_rows[idx] = vals
    for c in range(n_full, n_chunks):
        # the final partial chunk is host-coded in reference layout
        payload = np.frombuffer(data, np.uint8)[offsets[c] : offsets[c + 1]]
        vals = _chunked._host_fp_decode(payload, bits)
        out[c * chunk_len : c * chunk_len + len(vals)] = vals
    return out


def decode_vertices_sharded(container: bytes, mesh: Mesh | None = None) -> np.ndarray:
    """Back-compat alias for :func:`decode_plane_sharded` (f32 era name)."""
    return decode_plane_sharded(container, mesh)


def decode_bp_sharded(container: bytes, mesh: Mesh | None = None) -> np.ndarray:
    """Collective-free distributed decode of one BP32 chunked container.

    Same shape as :func:`decode_plane_sharded`: host parses the framing,
    scatters the padded payload matrix over the mesh's chunk axis, every
    device decodes its chunks with zero communication (the bit-plane parse is
    closed-form — bp_jax.decode_bp32/64_chunks), host decodes the ragged
    tail. Covers both element widths (u64 rides (hi, lo) word pairs).
    """
    from .. import chunked as _chunked

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    data = bytes(container)
    # bounds-validated framing parse — sizes are untrusted (ADVICE r4 high)
    hdr, sizes, off = _chunked.parse_validated_framing(data)
    if hdr.kind != "bp":
        raise ValueError("expected a BP32 chunked container")
    chunk_len, total, n_chunks = hdr.chunk_len, hdr.total, hdr.n_chunks
    eb = hdr.bits // 8
    if chunk_len % 32 or (eb == 8 and chunk_len > 8192):
        # BP64 device slot-id bit bound / non-group-aligned chunk length:
        # decode on the host instead
        return _chunked.decode_bp_chunked(data, use_tpu=False)
    dt = np.uint32 if eb == 4 else np.uint64
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64) + off
    if n_chunks == 0 or total == 0:
        return np.zeros(total, dt)
    n_full = n_chunks - 1 if total % chunk_len else n_chunks
    out = np.empty(total, dt)
    if n_full:
        B = (bp_jax.bp32_max_chunk_bytes(chunk_len) if eb == 4
             else bp_jax.bp64_max_chunk_bytes(chunk_len))
        buf = np.frombuffer(data, np.uint8)
        mat = _chunked.bytes_to_rows(
            buf[offsets[0] : offsets[n_full]],
            np.asarray(sizes[:n_full], np.int64), B)
        _chunked.validate_bp_chunk_headers(
            mat, np.asarray(sizes[:n_full], np.int64), chunk_len, eb * 8)
        Cp = max(((n_full + n_dev - 1) // n_dev) * n_dev, n_dev)
        sub = np.zeros((Cp, B), np.uint8)
        sub[:n_full] = mat
        got = _sharded_decode_bp(
            _put_sharded(sub, mesh, P("chunks", None)), chunk_len, eb,
            mesh=mesh)
        if eb == 4:
            vals = _gather_to_host(got)[:n_full]
        else:
            vh = _gather_to_host(got[0])[:n_full].astype(np.uint64)
            vl = _gather_to_host(got[1])[:n_full].astype(np.uint64)
            vals = (vh << np.uint64(32)) | vl
        out[: n_full * chunk_len] = vals.reshape(-1)
    for c in range(n_full, n_chunks):
        n_tail = total - c * chunk_len
        out[c * chunk_len :] = _chunked._bp_host_decode(
            np.frombuffer(data, np.uint8)[offsets[c] : offsets[c + 1]],
            n_tail, eb)
    return out


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
