"""Oracle KZG tests, anchored on the real trusted setup file.

The algebraic identities here cross-validate the whole oracle stack against
real-world data: decompression, subgroup checks, BRP, roots of unity, MSM
and pairing all have to be simultaneously correct for them to hold.
"""

import hashlib
import random

import pytest

from kateth_tpu.oracle import curve as c
from kateth_tpu.oracle import field as f
from kateth_tpu.oracle import kzg


rng = random.Random(0x4844)


def random_blob(seed: int) -> bytes:
    r = random.Random(seed)
    out = bytearray()
    for _ in range(kzg.FIELD_ELEMENTS_PER_BLOB):
        v = int.from_bytes(hashlib.sha256(r.randbytes(64)).digest(), "big") % f.R
        out += v.to_bytes(32, "big")
    return bytes(out)


def test_brp_involution():
    xs = list(range(4096))
    assert kzg.bit_reversal_permutation(kzg.bit_reversal_permutation(xs)) == xs
    assert kzg.bit_reversal_permutation([0, 1, 2, 3]) == [0, 2, 1, 3]


def test_roots_of_unity():
    roots = kzg.compute_roots_of_unity(4096)
    w = roots[1]
    assert roots[0] == 1
    assert pow(w, 4096, f.R) == 1
    assert pow(w, 2048, f.R) != 1  # primitive
    assert roots[2] == w * w % f.R


def test_setup_lagrange_sum_is_generator(oracle_setup):
    """sum_i L_i(tau) = 1 so sum of Lagrange points must be the generator."""
    acc = c.g1_infinity()
    for pt in oracle_setup.g1_lagrange_brp:
        acc = c.g1_add(acc, pt)
    assert c.g1_eq(acc, c.G1_GEN)


def test_setup_tau_consistency(oracle_setup):
    """sum_i w_i L_i(tau) = tau  =>  e(sum, G2) == e(G1, [tau]_2).

    Exercises decompression, BRP alignment, MSM and the pairing together.
    """
    from kateth_tpu.oracle import pairing as pr

    tau1 = c.g1_msm(oracle_setup.g1_lagrange_brp, oracle_setup.roots_brp)
    tau2 = oracle_setup.g2_monomial[1]
    assert pr.verify_pairings((tau1, c.G2_GEN), (c.G1_GEN, tau2))


def test_g2_monomial_chain(oracle_setup):
    """e([tau^i]_2 relation: e(G1, g2[i+1]) == e([tau]_1, g2[i]) spot check."""
    from kateth_tpu.oracle import pairing as pr

    tau1 = c.g1_msm(oracle_setup.g1_lagrange_brp, oracle_setup.roots_brp)
    g2 = oracle_setup.g2_monomial
    assert pr.verify_pairings((c.G1_GEN, g2[2]), (tau1, g2[1]))


def test_blob_validation():
    blob = random_blob(1)
    elems = kzg.blob_from_bytes(blob)
    assert len(elems) == 4096
    with pytest.raises(kzg.KzgError):
        kzg.blob_from_bytes(blob[:-1])
    bad = bytearray(blob)
    bad[0:32] = b"\xff" * 32  # non-canonical
    with pytest.raises(kzg.KzgError):
        kzg.blob_from_bytes(bytes(bad))


def test_evaluate_at_root_returns_element(oracle_setup):
    blob = random_blob(2)
    elems = kzg.blob_from_bytes(blob)
    i = 137
    z = oracle_setup.roots_brp[i]
    assert oracle_setup._evaluate(elems, z) == elems[i]


def test_evaluate_linear_polynomial(oracle_setup):
    """Poly with evaluations f(w_i) = a + b*w_i must evaluate to a + b*z."""
    a, b = rng.randrange(f.R), rng.randrange(f.R)
    elems = [(a + b * w) % f.R for w in oracle_setup.roots_brp]
    z = rng.randrange(f.R)
    assert oracle_setup._evaluate(elems, z) == (a + b * z) % f.R


def test_commitment_of_linear_poly(oracle_setup):
    """Commitment to f(x) = a + b x must equal a*G1 + b*[tau]_1."""
    a, b = rng.randrange(f.R), rng.randrange(f.R)
    elems = [(a + b * w) % f.R for w in oracle_setup.roots_brp]
    comm = oracle_setup._commit(elems)
    tau1 = c.g1_msm(oracle_setup.g1_lagrange_brp, oracle_setup.roots_brp)
    expected = c.g1_add(c.g1_mul(c.G1_GEN, a), c.g1_mul(tau1, b))
    assert c.g1_eq(comm, expected)


@pytest.fixture(scope="module")
def small_e2e(oracle_setup):
    blob = random_blob(3)
    commitment = oracle_setup.blob_to_commitment(blob)
    proof = oracle_setup.blob_proof(blob, commitment)
    return blob, commitment, proof


def test_blob_proof_verifies(oracle_setup, small_e2e):
    blob, commitment, proof = small_e2e
    assert oracle_setup.verify_blob_proof(blob, commitment, proof)


def test_blob_proof_wrong_blob_fails(oracle_setup, small_e2e):
    blob, commitment, proof = small_e2e
    other = random_blob(4)
    assert not oracle_setup.verify_blob_proof(other, commitment, proof)


def test_point_proof_verifies(oracle_setup, small_e2e):
    blob, commitment, _ = small_e2e
    z = rng.randrange(f.R).to_bytes(32, "big")
    proof, y = oracle_setup.proof(blob, z)
    assert oracle_setup.verify_proof(proof, commitment, z, y)
    bad_y = ((int.from_bytes(y, "big") + 1) % f.R).to_bytes(32, "big")
    assert not oracle_setup.verify_proof(proof, commitment, z, bad_y)


def test_proof_at_root(oracle_setup, small_e2e):
    """z hitting a root exercises the special-case quotient row."""
    blob, commitment, _ = small_e2e
    i = 42
    z = oracle_setup.roots_brp[i].to_bytes(32, "big")
    proof, y = oracle_setup.proof(blob, z)
    elems = kzg.blob_from_bytes(blob)
    assert int.from_bytes(y, "big") == elems[i]
    assert oracle_setup.verify_proof(proof, commitment, z, y)


def test_batch_verify(oracle_setup):
    blobs = [random_blob(10 + i) for i in range(3)]
    commitments = [oracle_setup.blob_to_commitment(b) for b in blobs]
    proofs = [oracle_setup.blob_proof(b, cm) for b, cm in zip(blobs, commitments)]
    assert oracle_setup.verify_blob_proof_batch(blobs, commitments, proofs)
    # swap two proofs -> must fail
    assert not oracle_setup.verify_blob_proof_batch(
        blobs, commitments, [proofs[1], proofs[0], proofs[2]]
    )


def test_verify_rejects_bad_encoding(oracle_setup, small_e2e):
    blob, commitment, proof = small_e2e
    with pytest.raises(c.DecompressError):
        oracle_setup.verify_blob_proof(blob, b"\x00" * 48, proof)
