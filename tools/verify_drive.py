"""End-to-end drive of the six public KZG ops vs the oracle (verify-skill
recipe): small insecure setup, byte-level comparisons, error-path probes.

Run: python tools/verify_drive.py   (CPU-forced; ~minutes warm)
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_max_isa" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_max_isa=AVX2").strip()
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import random

from kateth_tpu.kzg import Kzg, KzgConfig, DeviceSetup, KzgError
from kateth_tpu.oracle.kzg import OracleSetup, blob_to_bytes
from kateth_tpu.oracle import field as of

rng = random.Random(0xD21BE)
N = 8

osetup = OracleSetup.generate_insecure(N, g2_len=2)
kzg = Kzg(DeviceSetup.from_oracle(osetup, KzgConfig(n=N, g2_len=2)))


def blob():
    return blob_to_bytes([rng.randrange(of.R) for _ in range(N)])


blobs = [blob() for _ in range(3)]

# 1. blob_to_kzg_commitment
cms = [kzg.blob_to_kzg_commitment(b) for b in blobs]
assert cms == [osetup.blob_to_commitment(b) for b in blobs], "commitment mismatch"
print("1. blob_to_kzg_commitment OK")

# 2. compute_kzg_proof (incl. root hit)
z = of.fr_to_be_bytes(rng.randrange(of.R))
p1, y1 = kzg.compute_kzg_proof(blobs[0], z)
assert (p1, y1) == osetup.proof(blobs[0], z), "proof mismatch"
zr = of.fr_to_be_bytes(osetup.roots_brp[3])
p2, y2 = kzg.compute_kzg_proof(blobs[0], zr)
assert (p2, y2) == osetup.proof(blobs[0], zr), "root-hit proof mismatch"
print("2. compute_kzg_proof OK")

# 3. compute_blob_kzg_proof
bps = [kzg.compute_blob_kzg_proof(b, c) for b, c in zip(blobs, cms)]
assert bps == [osetup.blob_proof(b, c) for b, c in zip(blobs, cms)], "blob proof"
print("3. compute_blob_kzg_proof OK")

# 4. verify_kzg_proof
assert kzg.verify_kzg_proof(p1, cms[0], z, y1) is True
bad_y = ((int.from_bytes(y1, "big") + 1) % of.R).to_bytes(32, "big")
assert kzg.verify_kzg_proof(p1, cms[0], z, bad_y) is False
print("4. verify_kzg_proof OK")

# 5. verify_blob_kzg_proof
assert kzg.verify_blob_kzg_proof(blobs[0], cms[0], bps[0]) is True
assert kzg.verify_blob_kzg_proof(blobs[0], cms[1], bps[0]) is False
print("5. verify_blob_kzg_proof OK")

# 6. verify_blob_kzg_proof_batch
assert kzg.verify_blob_kzg_proof_batch(blobs, cms, bps) is True
assert kzg.verify_blob_kzg_proof_batch(blobs, cms, bps[::-1]) is False
assert kzg.verify_blob_kzg_proof_batch([], [], []) is True
print("6. verify_blob_kzg_proof_batch OK")

# 7. coefficients roundtrip
(coeffs,) = kzg.blobs_to_coefficients([blobs[0]])
(rt,) = kzg.coefficients_to_blobs([coeffs])
assert rt == blobs[0], "coefficient roundtrip"
print("7. blobs_to_coefficients roundtrip OK")

# 8. error paths: must raise, never return False
for fn in (
    lambda: kzg.blob_to_kzg_commitment(b"\x00" * 31),
    lambda: kzg.blob_to_kzg_commitment(b"\xff" * (32 * N)),
    lambda: kzg.compute_kzg_proof(blobs[0], of.R.to_bytes(32, "big")),
    lambda: kzg.compute_blob_kzg_proof(blobs[0], b"\x01" * 48),
    lambda: kzg.verify_kzg_proof(b"\x01" * 48, cms[0], z, y1),
    lambda: kzg.verify_kzg_proof(p1, cms[0], z, of.R.to_bytes(32, "big")),
    lambda: kzg.verify_blob_kzg_proof(blobs[0], b"\x01" * 48, bps[0]),
    lambda: kzg.verify_blob_kzg_proof_batch([blobs[0]], [cms[0]], [b"\x01" * 48]),
    lambda: kzg.verify_blob_kzg_proof_batch([b"\xff" * (32 * N)], [cms[0]], [bps[0]]),
):
    try:
        fn()
    except KzgError:
        pass
    else:
        raise AssertionError("error path did not raise")
print("8. error paths OK")

print("VERIFY-DRIVE: ALL OK")
