"""Multi-process scaling-efficiency measurement (VERDICT r4 #4).

Runs the SAME fixed workload — a Lucy-class f32 vertex stream through the
full distributed product (``compress_mesh``: shard_map encode, all-gather
size exscan, cross-process ``process_allgather`` byte gather) — over the
same 8-device global mesh decomposed into 1, 2, and 4 OS processes
(Gloo over localhost, the DCN code path of a real pod).

On this 2-vCPU host the cores are fixed while the process count varies, so
the honest scaling metric is *overhead efficiency*: with identical total
work and identical total compute, wall time should stay flat as the mesh is
split across processes — ``efficiency(N) = wall(1) / wall(N)``. Everything
the distributed path adds (process boundaries, Gloo collectives, duplicated
host assembly) shows up as efficiency < 1. The per-stage split also reports
the byte-gather (DCN-leg) share of wall directly. The BASELINE target is
>= 85%.

Usage:   python scripts/mp_scaling.py [--json MULTIPROC_r05.json]
Worker:  python scripts/mp_scaling.py --worker <rank> <nproc> <port> <dpp> <out>
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
N_VERTS = int(os.environ.get("TRICO_MP_SCALING_VERTS", str(1_200_000)))


def worker(rank: int, nproc: int, port: str, dpp: int, out: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dpp}")
    os.environ.setdefault("TRICO_TPU_SCAN_UNROLL", "1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                                   process_id=rank)
    assert len(jax.devices()) == dpp * nproc

    import numpy as np

    sys.path.insert(0, str(REPO))
    from trico_tpu.parallel import mesh_codec
    from trico_tpu.profiling import StageTimer

    mesh = mesh_codec.make_mesh()
    rng = np.random.default_rng(7)
    verts = (np.sin(np.linspace(0, 600 * np.pi, 3 * N_VERTS)) * 8
             + rng.normal(0, 1e-3, 3 * N_VERTS).cumsum()
             ).astype(np.float32).reshape(N_VERTS, 3)

    # warm-up compiles, then the timed run (best of 2)
    blob = mesh_codec.compress_mesh(verts, chunk_len=4096, mesh=mesh)
    best = None
    for _ in range(2):
        prof = StageTimer()
        t0 = time.perf_counter()
        c0 = time.process_time()
        blob2 = mesh_codec.compress_mesh(verts, chunk_len=4096, mesh=mesh,
                                         profile=prof)
        wall = time.perf_counter() - t0
        cpu = time.process_time() - c0
        assert blob2 == blob
        if best is None or wall < best["wall_s"]:
            best = {"wall_s": wall, "cpu_s": cpu,
                    "stages": {k: s.seconds for k, s in prof.stages.items()}}
    best.update(rank=rank, nproc=nproc, devices_per_proc=dpp,
                archive_bytes=len(blob), raw_bytes=int(verts.nbytes))
    Path(f"{out}.rank{rank}").write_text(json.dumps(best))
    if nproc > 1:
        jax.distributed.shutdown()


def free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def run_config(nproc: int, total_devices: int = 8, timeout: int = 900) -> dict:
    dpp = total_devices // nproc
    out = f"/tmp/mp_scaling_{nproc}"
    port = free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(Path(__file__).resolve()), "--worker",
             str(r), str(nproc), str(port), str(dpp), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(nproc)
    ]
    # drain all ranks concurrently: a sequential communicate() on rank 0
    # would deadlock if a later rank fills its 64 KiB stdout pipe mid-write
    # while every rank sits in a Gloo collective waiting for it
    import threading

    texts = [None] * nproc
    errs = [None] * nproc

    def _drain(i, p):
        try:
            stdout, _ = p.communicate(timeout=timeout)
            texts[i] = stdout.decode(errors="replace")
        except Exception as e:  # TimeoutExpired etc.
            errs[i] = e

    threads = [threading.Thread(target=_drain, args=(i, p))
               for i, p in enumerate(procs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if any(errs):
        for p in procs:  # exact PIDs we started — never pkill by pattern
            if p.poll() is None:
                p.kill()
        raise RuntimeError(f"worker drain failed: {[e for e in errs if e]}")
    for r, (p, t) in enumerate(zip(procs, texts)):
        if p.returncode != 0:
            raise RuntimeError(f"rank {r} failed:\n{t[-2000:]}")
    ranks = [json.loads(Path(f"{out}.rank{r}").read_text())
             for r in range(nproc)]
    r0 = ranks[0]
    gather_s = r0["stages"].get("fp_gather", 0.0)
    return {
        "n_processes": nproc, "devices_per_proc": dpp,
        "wall_s": round(r0["wall_s"], 3),
        "cpu_s_total": round(sum(r["cpu_s"] for r in ranks), 3),
        "gather_s": round(gather_s, 4),
        "gather_frac": round(gather_s / r0["wall_s"], 4),
        "stage_seconds": {k: round(v, 4) for k, v in r0["stages"].items()},
        "archive_bytes": r0["archive_bytes"],
    }


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
               int(sys.argv[5]), sys.argv[6])
        return 0
    out_path = "MULTIPROC_r05.json"
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    rows = [run_config(n) for n in (1, 2, 4)]
    blobs = {r["archive_bytes"] for r in rows}
    wall1 = rows[0]["wall_s"]
    for r in rows:
        r["efficiency_vs_1proc"] = round(wall1 / r["wall_s"], 4)
    result = {
        "workload": f"compress_mesh, {N_VERTS} f32 vertices, 8-device mesh",
        "metric": "fixed work + fixed cores: wall(1 proc) / wall(N procs)",
        "host_note": f"{os.cpu_count()} physical cores host N XLA CPU "
                     "runtimes; configs with n_processes > cores are "
                     "oversubscribed (visible as cpu_s_total inflation), "
                     "which a real pod — one host per process — does not pay",
        "byte_identical_across_configs": len(blobs) == 1,
        "configs": rows,
        "scaling_efficiency_2proc": rows[1]["efficiency_vs_1proc"],
        "scaling_efficiency_4proc": rows[2]["efficiency_vs_1proc"],
        "ok": len(blobs) == 1,
    }
    Path(out_path).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result, indent=1))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
