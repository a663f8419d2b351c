import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs multichip).
# NOTE: the container's sitecustomize pins JAX_PLATFORMS=axon (tunneled TPU)
# and imports jax at interpreter startup, so a plain env var is NOT enough —
# jax.config.update below is what actually forces CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TRICO_TPU_SCAN_UNROLL", "1")  # fast compiles on CPU
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trico_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent))

REPO = Path(__file__).resolve().parents[1]
BUNNY = REPO / "tests" / "data" / "StanfordBunny.stl"


@pytest.fixture(scope="session")
def bunny_path():
    if not BUNNY.exists():
        pytest.skip("StanfordBunny.stl fixture not available")
    return BUNNY


@pytest.fixture(scope="session")
def bunny_vertices(bunny_path):
    """Deduplicated float32 vertex array (N, 3) of the bunny fixture."""
    from trico_tpu.io.stl import read_stl

    verts, tris = read_stl(bunny_path)
    return verts


@pytest.fixture(scope="session")
def bunny_triangles(bunny_path):
    """Deduplicated uint32 triangle index array (M, 3) of the bunny fixture."""
    from trico_tpu.io.stl import read_stl

    verts, tris = read_stl(bunny_path)
    return tris


def rng(seed=0):
    return np.random.default_rng(seed)


def mesh_like_floats(n, seed=0, dtype=np.float32):
    """Synthetic smooth coordinate stream (compresses like mesh data)."""
    r = np.random.default_rng(seed)
    t = np.linspace(0, 20 * np.pi, n, dtype=np.float64)
    vals = np.sin(t) * 10 + np.cumsum(r.normal(0, 1e-3, n))
    return vals.astype(dtype)
