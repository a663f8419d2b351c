"""Hardware smoke test: every device code path, tiny shapes, real TPU.

CPU tests prove bit-exactness through interpret mode, but Mosaic/XLA:TPU
enforce constraints the CPU backend does not (scoped-VMEM limits, layout
rules, the remote-compile pipeline) — r5's compile-time VMEM OOM in the BP32
compaction lived for weeks in a path only CPU tests ever ran. This script
compiles and round-trips every production device path once:

  f32 v2 encode/decode (fixed + adaptive), f64 v2 encode/decode,
  BP32 at the 16384 default, BP64 at the 8192 clamp, LZ4 pick-best,
  and the full compress_mesh -> decompress_mesh product pipeline.

Exit code 0 == every path compiled and round-tripped bit-exactly on the
attached device. Wall time is dominated by ~10 remote compiles (~40-60 s
each through the tunnel); no timing is measured, so relay sync-state does
not matter. Run alone (one TPU process at a time!).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _decode_sub(s):
    """Kind-dispatched substream decode (mirrors the reader call sites)."""
    from trico_tpu import chunked

    hdr = chunked.parse_container_header(s)
    if hdr is not None and hdr.kind == "bp":
        return chunked.decode_bp_chunked(s, use_tpu=True)
    return chunked.decode_lz4_chunked(s)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from trico_tpu import chunked
    from trico_tpu.codec import fp_jax
    from trico_tpu.parallel import mesh_codec

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    failures = []

    def check(name, ok):
        print(f"  {name}: {'ok' if ok else 'FAIL'} "
              f"[t+{time.perf_counter() - t0:.0f}s]", flush=True)
        if not ok:
            failures.append(name)

    n = 3 * 4096 + 77
    t = np.linspace(0, 40 * np.pi, n)
    f32 = (np.sin(t) * 10 + np.cumsum(rng.normal(0, 1e-3, n))).astype(np.float32)
    x32 = jnp.asarray(f32.view(np.uint32)[: 3 * 4096].reshape(3, 4096))

    pay, sz = fp_jax.encode_f32_chunks_v2(x32, 4, 6)
    dec = fp_jax.decode_f32_chunks_v2(pay, 4096, 4, 6)
    check("f32 v2 fixed", bool(jnp.all(dec == x32)))

    # adaptive payloads are self-describing per chunk; decode via container
    cont = chunked.encode_chunked(f32.view(np.uint32), 4096, use_tpu=True,
                                  layout="tpu", optimize=True)
    out, _ = chunked.decode_chunked(cont, use_tpu=True)
    check("f32 adaptive container", np.array_equal(out, f32.view(np.uint32)))

    f64 = f32.astype(np.float64)
    cont64 = chunked.encode_chunked(f64.view(np.uint64), 4096, use_tpu=True,
                                    layout="tpu", optimize=True)
    out64, _ = chunked.decode_chunked(cont64, use_tpu=True)
    check("f64 adaptive container", np.array_equal(out64, f64.view(np.uint64)))

    u32 = rng.integers(0, 60000, 2 * 16384 + 9).astype(np.uint32)
    cbp = chunked.encode_bp_chunked(u32, use_tpu=True)  # 16384 default
    check("bp32 @16384", np.array_equal(
        chunked.decode_bp_chunked(cbp, use_tpu=True), u32))

    u64 = rng.integers(0, 1 << 45, 2 * 8192 + 5).astype(np.uint64)
    cbp64 = chunked.encode_bp_chunked(u64, 8192, use_tpu=True)
    check("bp64 @8192", np.array_equal(
        chunked.decode_bp_chunked(cbp64, use_tpu=True), u64))

    from trico_tpu.codec import transpose

    # random-ish data: LZ4/fill win the pick-best
    subs = chunked.encode_int_best(u32, use_tpu=True)
    planes = [_decode_sub(s) for s in subs]
    check("int pick-best (lz4 branch)", np.array_equal(
        transpose.from_byte_planes(planes, np.uint32), u32))

    # index-like (delta-coherent) data: BP32 must win and decode on device.
    # BP streams carry the full values in substream 0 (the rest are empty
    # placeholders keeping the substream count — FORMAT.md §6)
    idx = (np.arange(200_000, dtype=np.uint32) // 3
           + rng.integers(0, 7, 200_000).astype(np.uint32))
    subs_i = chunked.encode_int_best(idx, use_tpu=True)
    kinds = [chunked.parse_container_header(s).kind for s in subs_i]
    check("int pick-best (bp branch)", kinds[0] == "bp" and np.array_equal(
        chunked.decode_bp_chunked(subs_i[0], use_tpu=True), idx))

    nv = 50_000
    tv = np.linspace(0, 60 * np.pi, nv)
    verts = np.stack([
        (np.sin(tv + p) * 10 + np.cumsum(rng.normal(0, 1e-3, nv))
         ).astype(np.float32) for p in (0.0, 1.0, 2.0)], axis=1)
    tris = rng.integers(0, nv, (2 * nv, 3)).astype(np.uint32)
    mesh = mesh_codec.make_mesh()
    blob = mesh_codec.compress_mesh(verts, tris, chunk_len=4096, mesh=mesh)
    got = mesh_codec.decompress_mesh(blob, mesh=mesh)
    check("compress_mesh/decompress_mesh", bool(
        np.array_equal(got["vertices"].view(np.uint32), verts.view(np.uint32))
        and np.array_equal(got["triangles"], tris)))

    if failures:
        print(f"SMOKE FAILED: {failures}", flush=True)
        return 1
    print(f"smoke ok ({time.perf_counter() - t0:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
