"""Shared fixtures.

JAX device policy for tests: force CPU with an 8-device virtual mesh so all
sharding/shard_map code paths run without TPU hardware (the driver's bench
runs on the real chip separately).
"""

import os

# FORCE cpu: the environment pins JAX_PLATFORMS=axon (remote TPU tunnel)
# whose lazy init stalls unit tests, and its sitecustomize imports jax at
# interpreter startup, so env vars alone are too late — we must also update
# the live jax config.  The driver benches on the real chip separately.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Pin the CPU ISA: this VM floats across heterogeneous hosts (AMX/AVX512
# appear and vanish between runs), and persistent-cache AOT executables
# compiled on a bigger host SIGSEGV when deserialized on a smaller one.
# AVX2 is the stable common baseline.
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the digit-plane graphs are chunky and this
# box has one CPU core; caching compiles across test runs is a big win.
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo_root, ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import hashlib
import pickle

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRUSTED_SETUP_JSON = os.path.join(
    REPO_ROOT, "kateth_tpu", "data", "trusted_setup_4096.json"
)
CACHE_DIR = os.path.join(REPO_ROOT, ".cache")


def oracle_setup_cached(setup_path: str):
    """Parsed + validated trusted setup (oracle form), disk-cached because
    the 4161 subgroup checks take ~40s in pure Python.  The cache is keyed
    on the setup file's content hash so a changed setup can never silently
    reuse a stale oracle (same scheme as bench.py)."""
    from kateth_tpu.oracle.kzg import OracleSetup

    with open(setup_path, "rb") as f:
        setup_hash = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(CACHE_DIR, exist_ok=True)
    cache = os.path.join(CACHE_DIR, f"oracle_setup_{setup_hash}.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    setup = OracleSetup.load_json(setup_path)
    with open(cache, "wb") as f:
        pickle.dump(setup, f)
    return setup


@pytest.fixture(scope="session")
def oracle_setup():
    return oracle_setup_cached(TRUSTED_SETUP_JSON)
