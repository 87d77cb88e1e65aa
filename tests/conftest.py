"""Shared fixtures.

JAX device policy for tests: force CPU with an 8-device virtual mesh so all
sharding/shard_map code paths run without TPU hardware (the driver's bench
runs on the real chip separately).
"""

import os

# Must be set before jax imports anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pickle

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRUSTED_SETUP_JSON = "/root/reference/trusted_setup_4096.json"
CACHE_DIR = os.path.join(REPO_ROOT, ".cache")


@pytest.fixture(scope="session")
def oracle_setup():
    """Parsed + validated trusted setup (oracle form), disk-cached because
    the 4161 subgroup checks take ~40s in pure Python."""
    from kateth_tpu.oracle.kzg import OracleSetup

    os.makedirs(CACHE_DIR, exist_ok=True)
    cache = os.path.join(CACHE_DIR, "oracle_setup.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    setup = OracleSetup.load_json(TRUSTED_SETUP_JSON)
    with open(cache, "wb") as f:
        pickle.dump(setup, f)
    return setup
