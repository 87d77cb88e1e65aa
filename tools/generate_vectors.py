"""Generate vendored KZG test vectors with the CPU oracle.

The reference's consensus-spec-tests submodule is EMPTY in this environment
(see SURVEY.md §4), so we vendor oracle-generated vectors in the same
data.yaml shape as ethereum/consensus-spec-tests deneb/kzg. The oracle is
itself validated against the real trusted setup via algebraic pairing
identities (tests/test_oracle_kzg.py), so these vectors anchor bit-exact
parity for the device implementation.

Layout: tests/vectors/<op>/<case>/data.yaml with {input: ..., output: ...};
output null means the implementation MUST reject the input (error), while
boolean outputs are honest verification results.
"""

import hashlib
import os
import pickle
import random
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kateth_tpu.oracle import curve as c  # noqa: E402
from kateth_tpu.oracle import field as f  # noqa: E402
from kateth_tpu.oracle import kzg  # noqa: E402

VECTORS = os.path.join(REPO, "tests", "vectors")


def hexs(b: bytes) -> str:
    return "0x" + b.hex()


def random_blob(seed: int) -> bytes:
    r = random.Random(seed)
    out = bytearray()
    for _ in range(kzg.FIELD_ELEMENTS_PER_BLOB):
        v = int.from_bytes(hashlib.sha256(r.randbytes(64)).digest(), "big") % f.R
        out += v.to_bytes(32, "big")
    return bytes(out)


def write_case(op: str, name: str, data: dict):
    d = os.path.join(VECTORS, op, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "data.yaml"), "w") as fh:
        yaml.safe_dump(data, fh, sort_keys=False)


def not_in_subgroup_g1() -> bytes:
    x = 1
    while True:
        y2 = (x * x * x + 4) % f.P
        y = f.fp_sqrt(y2)
        if y is not None and not c.g1_in_subgroup((x, y, 1)):
            return c.g1_compress((x, y, 1))
        x += 1


def not_on_curve_g1() -> bytes:
    x = 5
    while True:
        if f.fp_sqrt((x * x * x + 4) % f.P) is None:
            enc = bytearray(x.to_bytes(48, "big"))
            enc[0] |= 0x80
            return bytes(enc)
        x += 1


def bad_point_matrix(setup, good_point: bytes) -> dict:
    """Adversarial 48-byte encodings, every one of which MUST be rejected
    (c-kzg/blst flag semantics; oracle g1_decompress enforces the same):
    compression bit clear, infinity flag with nonzero body, infinity with
    sign bit, x >= p, and sign-bit tampering that leaves the curve."""
    cases = {}
    # top (compression) bit clear — uncompressed prefix is not allowed here
    enc = bytearray(good_point)
    enc[0] &= 0x7F
    cases["not_compressed"] = bytes(enc)
    # infinity flag with a nonzero x body
    enc = bytearray([0xC0] + [0] * 47)
    enc[47] = 1
    cases["infinity_nonzero_x"] = bytes(enc)
    # infinity with the sign flag set
    cases["infinity_with_sign_bit"] = bytes([0xE0] + [0] * 47)
    # x >= p (non-canonical base-field element)
    enc = bytearray((f.P + 1).to_bytes(48, "big"))
    enc[0] |= 0x80
    cases["x_noncanonical"] = bytes(enc)
    return cases


def main():
    # content-hash-keyed oracle cache (same scheme as bench.py /
    # tests/conftest.py): a changed trusted setup can never silently emit
    # vectors generated from a stale oracle pickle.
    from kateth_tpu.kzg.setup import DEFAULT_TRUSTED_SETUP

    with open(DEFAULT_TRUSTED_SETUP, "rb") as fh:
        setup_hash = hashlib.sha256(fh.read()).hexdigest()[:16]
    cache = os.path.join(REPO, ".cache", f"oracle_setup_{setup_hash}.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            setup = pickle.load(fh)
    else:
        setup = kzg.OracleSetup.load_json(DEFAULT_TRUSTED_SETUP)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        with open(cache, "wb") as fh:
            pickle.dump(setup, fh)

    blobs = [random_blob(i) for i in range(4)]
    comms = [setup.blob_to_commitment(b) for b in blobs]
    proofs = [setup.blob_proof(b, cm) for b, cm in zip(blobs, comms)]

    bad_sub = not_in_subgroup_g1()
    bad_curve = not_on_curve_g1()
    bad_blob_noncanon = bytearray(blobs[0])
    bad_blob_noncanon[0:32] = b"\xff" * 32
    bad_blob_noncanon = bytes(bad_blob_noncanon)
    short_blob = blobs[0][:-31]

    # ---- blob_to_kzg_commitment ----
    for i, (b, cm) in enumerate(zip(blobs, comms)):
        write_case(
            "blob_to_kzg_commitment",
            f"valid_{i}",
            {"input": {"blob": hexs(b)}, "output": hexs(cm)},
        )
    write_case(
        "blob_to_kzg_commitment",
        "invalid_noncanonical_element",
        {"input": {"blob": hexs(bad_blob_noncanon)}, "output": None},
    )
    write_case(
        "blob_to_kzg_commitment",
        "invalid_length",
        {"input": {"blob": hexs(short_blob)}, "output": None},
    )

    # ---- compute_kzg_proof ----
    zs = [
        random.Random(100).randrange(f.R),
        setup.roots_brp[42],  # root hit -> special-case quotient row
        0,
        f.R - 1,
    ]
    for i, z in enumerate(zs):
        zb = z.to_bytes(32, "big")
        proof, y = setup.proof(blobs[0], zb)
        write_case(
            "compute_kzg_proof",
            f"valid_{i}",
            {
                "input": {"blob": hexs(blobs[0]), "z": hexs(zb)},
                "output": [hexs(proof), hexs(y)],
            },
        )
    write_case(
        "compute_kzg_proof",
        "invalid_z_noncanonical",
        {
            "input": {"blob": hexs(blobs[0]), "z": hexs(f.R.to_bytes(32, "big"))},
            "output": None,
        },
    )
    write_case(
        "compute_kzg_proof",
        "invalid_blob",
        {
            "input": {"blob": hexs(bad_blob_noncanon), "z": hexs((1).to_bytes(32, "big"))},
            "output": None,
        },
    )

    # ---- compute_blob_kzg_proof ----
    for i in range(2):
        write_case(
            "compute_blob_kzg_proof",
            f"valid_{i}",
            {
                "input": {"blob": hexs(blobs[i]), "commitment": hexs(comms[i])},
                "output": hexs(proofs[i]),
            },
        )
    write_case(
        "compute_blob_kzg_proof",
        "invalid_commitment_not_in_subgroup",
        {"input": {"blob": hexs(blobs[0]), "commitment": hexs(bad_sub)}, "output": None},
    )
    write_case(
        "compute_blob_kzg_proof",
        "invalid_commitment_not_on_curve",
        {"input": {"blob": hexs(blobs[0]), "commitment": hexs(bad_curve)}, "output": None},
    )

    # ---- verify_kzg_proof ----
    z = random.Random(200).randrange(f.R)
    zb = z.to_bytes(32, "big")
    proof, y = setup.proof(blobs[0], zb)
    write_case(
        "verify_kzg_proof",
        "valid_true",
        {
            "input": {
                "commitment": hexs(comms[0]),
                "z": hexs(zb),
                "y": hexs(y),
                "proof": hexs(proof),
            },
            "output": True,
        },
    )
    bad_y = ((int.from_bytes(y, "big") + 1) % f.R).to_bytes(32, "big")
    write_case(
        "verify_kzg_proof",
        "valid_false_wrong_y",
        {
            "input": {
                "commitment": hexs(comms[0]),
                "z": hexs(zb),
                "y": hexs(bad_y),
                "proof": hexs(proof),
            },
            "output": False,
        },
    )
    write_case(
        "verify_kzg_proof",
        "invalid_proof_encoding",
        {
            "input": {
                "commitment": hexs(comms[0]),
                "z": hexs(zb),
                "y": hexs(y),
                "proof": hexs(bytes(48)),
            },
            "output": None,
        },
    )
    write_case(
        "verify_kzg_proof",
        "invalid_commitment_not_in_subgroup",
        {
            "input": {
                "commitment": hexs(bad_sub),
                "z": hexs(zb),
                "y": hexs(y),
                "proof": hexs(proof),
            },
            "output": None,
        },
    )
    # infinity proof/commitment are VALID encodings (must verify-or-false,
    # not error): commitment=proof=infinity commits to zero polynomial
    zero_blob = bytes(kzg.BYTES_PER_BLOB)
    inf = bytes([0xC0] + [0] * 47)
    write_case(
        "verify_kzg_proof",
        "valid_true_zero_poly_infinity",
        {
            "input": {
                "commitment": hexs(inf),
                "z": hexs(zb),
                "y": hexs(bytes(32)),
                "proof": hexs(inf),
            },
            "output": True,
        },
    )

    # ---- verify_blob_kzg_proof ----
    write_case(
        "verify_blob_kzg_proof",
        "valid_true",
        {
            "input": {
                "blob": hexs(blobs[1]),
                "commitment": hexs(comms[1]),
                "proof": hexs(proofs[1]),
            },
            "output": True,
        },
    )
    write_case(
        "verify_blob_kzg_proof",
        "valid_false_wrong_proof",
        {
            "input": {
                "blob": hexs(blobs[1]),
                "commitment": hexs(comms[1]),
                "proof": hexs(proofs[0]),
            },
            "output": False,
        },
    )
    write_case(
        "verify_blob_kzg_proof",
        "valid_true_zero_blob",
        {
            "input": {
                "blob": hexs(zero_blob),
                "commitment": hexs(inf),
                "proof": hexs(setup.blob_proof(zero_blob, inf)),
            },
            "output": True,
        },
    )
    write_case(
        "verify_blob_kzg_proof",
        "invalid_blob",
        {
            "input": {
                "blob": hexs(bad_blob_noncanon),
                "commitment": hexs(comms[1]),
                "proof": hexs(proofs[1]),
            },
            "output": None,
        },
    )
    write_case(
        "verify_blob_kzg_proof",
        "invalid_proof_not_on_curve",
        {
            "input": {
                "blob": hexs(blobs[1]),
                "commitment": hexs(comms[1]),
                "proof": hexs(bad_curve),
            },
            "output": None,
        },
    )

    # ---- verify_blob_kzg_proof_batch ----
    for n in (1, 2, 4):
        write_case(
            "verify_blob_kzg_proof_batch",
            f"valid_true_{n}",
            {
                "input": {
                    "blobs": [hexs(b) for b in blobs[:n]],
                    "commitments": [hexs(cm) for cm in comms[:n]],
                    "proofs": [hexs(p) for p in proofs[:n]],
                },
                "output": True,
            },
        )
    write_case(
        "verify_blob_kzg_proof_batch",
        "valid_false_swapped_proofs",
        {
            "input": {
                "blobs": [hexs(b) for b in blobs[:2]],
                "commitments": [hexs(cm) for cm in comms[:2]],
                "proofs": [hexs(proofs[1]), hexs(proofs[0])],
            },
            "output": False,
        },
    )
    write_case(
        "verify_blob_kzg_proof_batch",
        "valid_true_empty",
        {
            "input": {"blobs": [], "commitments": [], "proofs": []},
            "output": True,
        },
    )
    write_case(
        "verify_blob_kzg_proof_batch",
        "invalid_bad_proof_encoding",
        {
            "input": {
                "blobs": [hexs(blobs[0])],
                "commitments": [hexs(comms[0])],
                "proofs": [hexs(bytes(48))],
            },
            "output": None,
        },
    )

    # ---- adversarial point-encoding matrix across every point-taking op
    z = random.Random(200).randrange(f.R)
    zb = z.to_bytes(32, "big")
    proof_v, y_v = setup.proof(blobs[0], zb)
    for name, bad in bad_point_matrix(setup, comms[0]).items():
        write_case(
            "compute_blob_kzg_proof",
            f"invalid_commitment_{name}",
            {"input": {"blob": hexs(blobs[0]), "commitment": hexs(bad)}, "output": None},
        )
        write_case(
            "verify_kzg_proof",
            f"invalid_commitment_{name}",
            {
                "input": {
                    "commitment": hexs(bad),
                    "z": hexs(zb),
                    "y": hexs(y_v),
                    "proof": hexs(proof_v),
                },
                "output": None,
            },
        )
        write_case(
            "verify_blob_kzg_proof",
            f"invalid_proof_{name}",
            {
                "input": {
                    "blob": hexs(blobs[0]),
                    "commitment": hexs(comms[0]),
                    "proof": hexs(bad),
                },
                "output": None,
            },
        )
        write_case(
            "verify_blob_kzg_proof_batch",
            f"invalid_commitment_{name}",
            {
                "input": {
                    "blobs": [hexs(blobs[0])],
                    "commitments": [hexs(bad)],
                    "proofs": [hexs(proofs[0])],
                },
                "output": None,
            },
        )

    # sign-bit flip negates the point: still a VALID encoding, verification
    # must return False (not an error)
    neg_comm = c.g1_compress(c.g1_neg(c.g1_decompress(comms[1])))
    write_case(
        "verify_blob_kzg_proof",
        "valid_false_negated_commitment",
        {
            "input": {
                "blob": hexs(blobs[1]),
                "commitment": hexs(neg_comm),
                "proof": hexs(proofs[1]),
            },
            "output": False,
        },
    )

    # y non-canonical (>= r) must error, not return False
    write_case(
        "verify_kzg_proof",
        "invalid_y_noncanonical",
        {
            "input": {
                "commitment": hexs(comms[0]),
                "z": hexs(zb),
                "y": hexs(f.R.to_bytes(32, "big")),
                "proof": hexs(proof_v),
            },
            "output": None,
        },
    )
    # blob element exactly == r: the minimal non-canonical value
    min_noncanon = bytearray(blobs[0])
    min_noncanon[0:32] = f.R.to_bytes(32, "big")
    write_case(
        "blob_to_kzg_commitment",
        "invalid_element_equals_r",
        {"input": {"blob": hexs(bytes(min_noncanon))}, "output": None},
    )

    # sanity: oracle verifies its own vectors
    assert setup.verify_blob_proof(blobs[1], comms[1], proofs[1])
    assert setup.verify_blob_proof_batch(blobs[:2], comms[:2], proofs[:2])
    print("vectors written to", VECTORS)


if __name__ == "__main__":
    main()
