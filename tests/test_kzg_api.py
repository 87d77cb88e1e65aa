"""End-to-end device KZG API vs the oracle on a small insecure setup.

The full 4096-element mainnet config only runs fast on real TPU hardware
(bench.py self-checks it there against vendored spec vectors); these CPU
tests exercise the identical size-generic code paths at n=8.
"""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from kateth_tpu.kzg import Kzg, KzgConfig, KzgError, DeviceSetup
from kateth_tpu.oracle.kzg import OracleSetup, blob_to_bytes
from kateth_tpu.oracle import field as of

rng = random.Random(0x6B7A67)

N = 8


@pytest.fixture(scope="module")
def osetup():
    return OracleSetup.generate_insecure(N, g2_len=2)


@pytest.fixture(scope="module")
def kzg(osetup):
    cfg = KzgConfig(n=N, g2_len=2)
    return Kzg(DeviceSetup.from_oracle(osetup, cfg))


def rand_blob():
    return blob_to_bytes([rng.randrange(of.R) for _ in range(N)])


def test_commitment_matches_oracle(kzg, osetup):
    blobs = [rand_blob() for _ in range(3)]
    got = kzg.blobs_to_kzg_commitments(blobs)
    want = [osetup.blob_to_commitment(b) for b in blobs]
    assert got == want


def test_compute_proof_matches_oracle(kzg, osetup):
    blobs = [rand_blob() for _ in range(2)]
    zs = [of.fr_to_be_bytes(rng.randrange(of.R)) for _ in range(2)]
    proofs, ys = kzg.compute_kzg_proofs(blobs, zs)
    for b, z, p, y in zip(blobs, zs, proofs, ys):
        wp, wy = osetup.proof(b, z)
        assert (p, y) == (wp, wy)


def test_compute_proof_at_root(kzg, osetup):
    """z equal to a domain root exercises the masked special-case row
    (reference poly.rs:48-64)."""
    blob = rand_blob()
    z = of.fr_to_be_bytes(osetup.roots_brp[5])
    proof, y = kzg.compute_kzg_proof(blob, z)
    wp, wy = osetup.proof(blob, z)
    assert (proof, y) == (wp, wy)


def test_blob_proof_and_verify(kzg, osetup):
    blob = rand_blob()
    cm = kzg.blob_to_kzg_commitment(blob)
    proof = kzg.compute_blob_kzg_proof(blob, cm)
    assert proof == osetup.blob_proof(blob, cm)
    assert kzg.verify_blob_kzg_proof(blob, cm, proof) is True
    # wrong proof: honest False, not an error
    other = kzg.compute_blob_kzg_proof(rand_blob(), cm)
    assert kzg.verify_blob_kzg_proof(blob, cm, other) is False


def test_verify_kzg_proof(kzg, osetup):
    blob = rand_blob()
    cm = kzg.blob_to_kzg_commitment(blob)
    z = of.fr_to_be_bytes(4242)
    proof, y = kzg.compute_kzg_proof(blob, z)
    assert kzg.verify_kzg_proof(proof, cm, z, y) is True
    bad_y = of.fr_to_be_bytes((int.from_bytes(y, "big") + 1) % of.R)
    assert kzg.verify_kzg_proof(proof, cm, z, bad_y) is False


def test_verify_batch(kzg, osetup):
    blobs = [rand_blob() for _ in range(3)]
    cms = kzg.blobs_to_kzg_commitments(blobs)
    proofs = kzg.compute_blob_kzg_proofs(blobs, cms)
    assert kzg.verify_blob_kzg_proof_batch(blobs, cms, proofs) is True
    assert kzg.verify_blob_kzg_proof_batch([], [], []) is True
    # swapped proofs: False
    assert (
        kzg.verify_blob_kzg_proof_batch(blobs, cms, [proofs[1], proofs[0], proofs[2]])
        is False
    )


class TestErrors:
    def test_bad_blob_length(self, kzg):
        with pytest.raises(KzgError):
            kzg.blob_to_kzg_commitment(b"\x00" * 31)

    def test_noncanonical_blob_element(self, kzg):
        blob = bytearray(rand_blob())
        blob[0:32] = b"\xff" * 32
        with pytest.raises(KzgError):
            kzg.blob_to_kzg_commitment(bytes(blob))

    def test_noncanonical_z(self, kzg):
        with pytest.raises(KzgError):
            kzg.compute_kzg_proof(rand_blob(), b"\xff" * 32)

    def test_bad_point(self, kzg):
        blob = rand_blob()
        with pytest.raises(KzgError):
            kzg.compute_blob_kzg_proof(blob, b"\x01" * 48)

    def test_batch_length_mismatch(self, kzg):
        with pytest.raises(KzgError):
            kzg.verify_blob_kzg_proof_batch([rand_blob()], [], [])


def test_verify_batches_streaming(kzg):
    """The streaming entry point (the bench headline path,
    api.py verify_blob_kzg_proof_batches): multi-batch verdicts, empty
    stream, empty batch inside the stream, honest False mid-stream."""
    blobs = [rand_blob() for _ in range(3)]
    cms = kzg.blobs_to_kzg_commitments(blobs)
    proofs = kzg.compute_blob_kzg_proofs(blobs, cms)
    batches = [
        (blobs, cms, proofs),
        ([], [], []),  # empty batch inside the stream
        (blobs[:1], cms[:1], proofs[:1]),
        (blobs, cms, [proofs[1], proofs[0], proofs[2]]),  # honest False
    ]
    assert kzg.verify_blob_kzg_proof_batches(batches) == [True, True, True, False]
    assert kzg.verify_blob_kzg_proof_batches([]) == []
    assert kzg.verify_blob_kzg_proof_batches(iter(batches[:1])) == [True]


def test_verify_batches_error_ordering(kzg):
    """Sequential-equivalent error semantics: the earliest bad batch's
    KzgError is raised, whether detected at dispatch or finalize."""
    blobs = [rand_blob()]
    cms = kzg.blobs_to_kzg_commitments(blobs)
    proofs = kzg.compute_blob_kzg_proofs(blobs, cms)
    bad = bytearray(blobs[0])
    bad[0:32] = b"\xff" * 32  # non-canonical element: DEVICE-side error

    # device-side error in batch 0 wins over host-side error in batch 1
    with pytest.raises(KzgError, match="non-canonical"):
        kzg.verify_blob_kzg_proof_batches(
            [([bytes(bad)], cms, proofs), (blobs, [], [])]
        )
    # host-side error in batch 0 raises even with valid batches after it
    with pytest.raises(KzgError, match="length mismatch"):
        kzg.verify_blob_kzg_proof_batches([(blobs, [], []), (blobs, cms, proofs)])
    # valid batch 0, device-side error in batch 1
    with pytest.raises(KzgError, match="non-canonical"):
        kzg.verify_blob_kzg_proof_batches(
            [(blobs, cms, proofs), ([bytes(bad)], cms, proofs)]
        )


def test_rlc_challenge_binds_all_inputs(kzg):
    """SECURITY pin (see Kzg._rlc_challenge): the batch RLC challenge r
    must change when ANY input changes — blobs bind through the per-blob
    challenge digests, so accidental removal of the digest term would
    fail the first assertion."""
    blob = rand_blob()
    cm = kzg.blob_to_kzg_commitment(blob)
    proof = kzg.compute_blob_kzg_proof(blob, cm)

    def r_for(b, c, p):
        jb, jc, jp = bytes(b), bytes(c), bytes(p)
        zd = kzg._challenge_digests(jb, jc, 1)
        return kzg._rlc_challenge(zd, jc, jp, 1)

    base = r_for(blob, cm, proof)
    flipped = bytearray(blob)
    flipped[40] ^= 1
    assert r_for(bytes(flipped), cm, proof) != base  # blob binds (via digest)
    other = kzg.blob_to_kzg_commitment(rand_blob())
    assert r_for(blob, other, proof) != base  # commitment binds
    assert r_for(blob, cm, other) != base  # proof binds


def test_coefficients_roundtrip_and_horner(kzg, osetup):
    """blobs_to_coefficients inverts coefficients_to_blobs, and the
    monomial coefficients really are the polynomial: Horner evaluation at
    each BRP'd domain root reproduces the blob elements."""
    blob = rand_blob()
    (coeffs,) = kzg.blobs_to_coefficients([blob])
    assert len(coeffs) == N
    (back,) = kzg.coefficients_to_blobs([coeffs])
    assert back == blob
    cs = [int.from_bytes(c, "big") for c in coeffs]
    elements = [int.from_bytes(blob[i * 32 : (i + 1) * 32], "big") for i in range(N)]
    for i, w in enumerate(osetup.roots_brp):
        acc = 0
        for c in reversed(cs):
            acc = (acc * w + c) % of.R
        assert acc == elements[i], f"Horner mismatch at root {i}"


def test_coefficients_noncanonical_rejects(kzg):
    bad = [of.R.to_bytes(32, "big")] + [bytes(32)] * (N - 1)
    with pytest.raises(KzgError):
        kzg.coefficients_to_blobs([bad])


def test_load_json_device_rejection_falls_back_to_oracle(osetup, monkeypatch, tmp_path):
    """A device-side setup rejection is rechecked on the host oracle
    (r5: the G2 decompress graph rejected the valid mainnet setup on
    v5e while bit-exact on CPU).  The oracle remains the validation
    authority: KATETH_SETUP_LOAD=device forces the device verdict."""
    import jax

    path = str(tmp_path / "setup.json")
    with open(path, "w") as f:
        f.write("{}")  # content only feeds the cache hash; loaders are patched
    cfg = KzgConfig(n=N, g2_len=2)

    def boom(cls_raw, config):
        raise KzgError("invalid G2 point in trusted setup")

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        DeviceSetup, "_load_json_device", classmethod(lambda cls, raw, config: boom(raw, config))
    )
    monkeypatch.setattr(
        OracleSetup,
        "load_json",
        staticmethod(lambda p, n=None, g2_len=None: osetup),
    )
    out = DeviceSetup.load_json(path, config=cfg, cache_dir=None)
    want = DeviceSetup.from_oracle(osetup, cfg)
    assert np.array_equal(np.asarray(out.g1x), np.asarray(want.g1x))

    monkeypatch.setenv("KATETH_SETUP_LOAD", "device")
    with pytest.raises(KzgError):
        DeviceSetup.load_json(path, config=cfg, cache_dir=None)
