"""Pure-Python oracle for the EIP-4844 KZG API.

Bit-exact reference semantics for all six public operations of the library
(reference: src/kzg/setup.rs:96-275, src/blob.rs, src/kzg/poly.rs), built on
the oracle field/curve/pairing modules.  Used to validate every device
kernel and to generate vendored spec-style test vectors (the reference's
consensus-spec-tests submodule is empty in this environment).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass

from .field import R, fr_batch_inv, fr_from_be_bytes, fr_to_be_bytes
from . import curve as c
from . import pairing as pr

FIELD_ELEMENTS_PER_BLOB = 4096
SETUP_G2_LEN = 65
BYTES_PER_BLOB = 32 * FIELD_ELEMENTS_PER_BLOB

FS_DOMAIN = b"FSBLOBVERIFY_V1_"  # blob.rs:79
RC_DOMAIN = b"RCKZGBATCH___V1_"  # setup.rs:127


class KzgError(Exception):
    """Any input-validation failure (vs. an honest `False` verification)."""


def hash_to_fr(data: bytes) -> int:
    """SHA-256 then reduce mod r (reference Fr::hash_to, bls.rs:189-205)."""
    return int.from_bytes(hashlib.sha256(data).digest(), "big") % R


def bit_reversal_permutation(xs):
    """BRP of a power-of-two-length sequence (reference math.rs:34-74)."""
    n = len(xs)
    assert n & (n - 1) == 0 and n > 0
    bits = n.bit_length() - 1
    return [xs[int(format(i, f"0{bits}b")[::-1], 2)] for i in range(n)]


def compute_roots_of_unity(order: int = FIELD_ELEMENTS_PER_BLOB):
    """omega = 7^((r-1)/order); returns [1, w, w^2, ...] (math.rs:5-29)."""
    assert (R - 1) % order == 0
    w = pow(7, (R - 1) // order, R)
    roots = []
    cur = 1
    for _ in range(order):
        roots.append(cur)
        cur = cur * w % R
    return roots


def blob_from_bytes(data: bytes, n: int = FIELD_ELEMENTS_PER_BLOB) -> list[int]:
    """Validate and decode a blob: every 32-byte chunk canonical BE Fr
    (reference Blob::from_slice, blob.rs:26-37)."""
    if len(data) != 32 * n:
        raise KzgError("invalid blob length")
    out = []
    for i in range(0, 32 * n, 32):
        v = fr_from_be_bytes(data[i : i + 32])
        if v is None:
            raise KzgError("non-canonical field element in blob")
        out.append(v)
    return out


def blob_to_bytes(elements) -> bytes:
    return b"".join(fr_to_be_bytes(e) for e in elements)


@dataclass
class OracleSetup:
    """Trusted setup with BRP'd tables (reference Setup, setup.rs:38-42)."""

    g1_lagrange_brp: list  # n Jacobian G1 points
    g2_monomial: list  # g2_len Jacobian G2 points
    roots_brp: list[int]  # n Fr ints
    n: int = FIELD_ELEMENTS_PER_BLOB

    @classmethod
    def load_json(cls, path, subgroup_check: bool = True,
                  n: int = FIELD_ELEMENTS_PER_BLOB, g2_len: int = SETUP_G2_LEN):
        with open(path) as f:
            raw = json.load(f)
        g1 = raw["g1_lagrange"]
        g2 = raw["g2_monomial"]
        if len(g1) != n:
            raise KzgError("invalid g1_lagrange length")
        if len(g2) != g2_len:
            raise KzgError("invalid g2_monomial length")
        g1_pts = [
            c.g1_decompress(bytes.fromhex(h[2:] if h.startswith("0x") else h), subgroup_check)
            for h in g1
        ]
        g2_pts = [
            c.g2_decompress(bytes.fromhex(h[2:] if h.startswith("0x") else h), subgroup_check)
            for h in g2
        ]
        roots = compute_roots_of_unity(n)
        return cls(
            g1_lagrange_brp=bit_reversal_permutation(g1_pts),
            g2_monomial=g2_pts,
            roots_brp=bit_reversal_permutation(roots),
            n=n,
        )

    @classmethod
    def generate_insecure(cls, n: int, g2_len: int = 2, tau: int = 0xDEADBEEF1234):
        """Small KNOWN-SECRET setup for tests: g1_lagrange[i] = [L_i(tau)]_1
        over the (non-BRP) domain, g2_monomial[j] = [tau^j]_2.

        L_i(tau) = (tau^n - 1) * w_i / (n * (tau - w_i))  for tau not a root.
        """
        roots = compute_roots_of_unity(n)
        scale = (pow(tau, n, R) - 1) * pow(n, R - 2, R) % R
        lag = [scale * w % R * pow((tau - w) % R, R - 2, R) % R for w in roots]
        g1_pts = [c.g1_mul(c.G1_GEN, l) for l in lag]
        g2_pts = [c.g2_mul(c.G2_GEN, pow(tau, j, R)) for j in range(g2_len)]
        return cls(
            g1_lagrange_brp=bit_reversal_permutation(g1_pts),
            g2_monomial=g2_pts,
            roots_brp=bit_reversal_permutation(roots),
            n=n,
        )

    def to_json_dict(self) -> dict:
        """Re-serialize as a trusted-setup JSON dict (undoes the BRP)."""
        inv = bit_reversal_permutation(list(range(self.n)))
        g1 = [None] * self.n
        for i, p in enumerate(self.g1_lagrange_brp):
            g1[inv[i]] = "0x" + c.g1_compress(p).hex()
        return {
            "g1_lagrange": g1,
            "g2_monomial": ["0x" + c.g2_compress(p).hex() for p in self.g2_monomial],
        }

    # -- internals ---------------------------------------------------------

    def _challenge(self, elements, commitment_bytes: bytes) -> int:
        """Fiat-Shamir challenge (reference Blob::challenge, blob.rs:78-97)."""
        data = (
            FS_DOMAIN
            + self.n.to_bytes(16, "big")
            + blob_to_bytes(elements)
            + commitment_bytes
        )
        return hash_to_fr(data)

    def _evaluate(self, elements, z: int) -> int:
        """Barycentric evaluation (reference Polynomial::evaluate,
        poly.rs:10-33), with batched inversion instead of per-term."""
        roots = self.roots_brp
        n = self.n
        for i in range(n):
            if z == roots[i]:
                return elements[i]
        denoms = [(z - w) % R for w in roots]
        invs = fr_batch_inv(denoms)
        acc = 0
        for f, w, inv in zip(elements, roots, invs):
            acc = (acc + f * w % R * inv) % R
        scale = (pow(z, n, R) - 1) * pow(n, R - 2, R) % R
        return acc * scale % R

    def _quotient(self, elements, z: int, y: int) -> list[int]:
        """Quotient polynomial q_i = (f_i - y)/(w_i - z) with the O(N)
        special-case row when z hits a root (reference poly.rs:44-66)."""
        roots = self.roots_brp
        n = self.n
        hit = None
        for i in range(n):
            if z == roots[i]:
                hit = i
                break
        denoms = [(w - z) % R for w in roots]
        invs = fr_batch_inv(denoms)  # invs[hit] == 0 if hit is not None
        q = [(f - y) * inv % R for f, inv in zip(elements, invs)]
        if hit is not None:
            wi = roots[hit]
            wi_inv = pow(wi, R - 2, R)
            acc = 0
            for j in range(n):
                if j == hit:
                    continue
                # (f_j - y) * w_j / (w_i * (w_i - w_j))
                # note (w_i - w_j) = -(w_j - w_i) = -denoms[j] evaluated at z=w_i
                term = (elements[j] - y) * roots[j] % R
                term = term * pow((wi - roots[j]) % R, R - 2, R) % R
                acc = (acc + term) % R
            q[hit] = acc * wi_inv % R
        return q

    def _commit(self, elements):
        return c.g1_msm(self.g1_lagrange_brp, elements)

    # -- the six public operations (reference setup.rs:96-275) -------------

    def blob_to_commitment(self, blob: bytes) -> bytes:
        elements = blob_from_bytes(blob, self.n)
        return c.g1_compress(self._commit(elements))

    def proof(self, blob: bytes, z_bytes: bytes) -> tuple[bytes, bytes]:
        """compute_kzg_proof: returns (proof_48, y_32)."""
        elements = blob_from_bytes(blob, self.n)
        z = fr_from_be_bytes(bytes(z_bytes))
        if z is None:
            raise KzgError("invalid evaluation point")
        y = self._evaluate(elements, z)
        q = self._quotient(elements, z, y)
        proof_pt = c.g1_msm(self.g1_lagrange_brp, q)
        return c.g1_compress(proof_pt), fr_to_be_bytes(y)

    def blob_proof(self, blob: bytes, commitment: bytes) -> bytes:
        """compute_blob_kzg_proof."""
        elements = blob_from_bytes(blob, self.n)
        c.g1_decompress(bytes(commitment))  # validation (setup.rs:179-180)
        z = self._challenge(elements, bytes(commitment))
        y = self._evaluate(elements, z)
        q = self._quotient(elements, z, y)
        return c.g1_compress(c.g1_msm(self.g1_lagrange_brp, q))

    def verify_proof(self, proof: bytes, commitment: bytes, z_bytes: bytes, y_bytes: bytes) -> bool:
        proof_pt = c.g1_decompress(bytes(proof))
        comm_pt = c.g1_decompress(bytes(commitment))
        z = fr_from_be_bytes(bytes(z_bytes))
        y = fr_from_be_bytes(bytes(y_bytes))
        if z is None or y is None:
            raise KzgError("invalid field element")
        return self._verify_inner(proof_pt, comm_pt, z, y)

    def _verify_inner(self, proof_pt, comm_pt, z: int, y: int) -> bool:
        """e(proof, [tau]_2 - z G2) == e(C - y G1, G2) (setup.rs:84-94)."""
        tau2 = self.g2_monomial[1]
        a2 = c.g2_add(tau2, c.g2_mul(c.g2_neg(c.G2_GEN), z))
        b1 = c.g1_add(comm_pt, c.g1_mul(c.g1_neg(c.G1_GEN), y))
        return pr.verify_pairings((proof_pt, a2), (b1, c.G2_GEN))

    def verify_blob_proof(self, blob: bytes, commitment: bytes, proof: bytes) -> bool:
        elements = blob_from_bytes(blob, self.n)
        comm_pt = c.g1_decompress(bytes(commitment))
        proof_pt = c.g1_decompress(bytes(proof))
        z = self._challenge(elements, bytes(commitment))
        y = self._evaluate(elements, z)
        return self._verify_inner(proof_pt, comm_pt, z, y)

    def verify_blob_proof_batch(self, blobs, commitments, proofs) -> bool:
        """verify_blob_kzg_proof_batch (setup.rs:115-161, 223-275).

        Uses standard RLC weights r^0=1, r^1, ... (documented divergence
        from the reference's Fr::pow quirk where rpowers[0] == r,
        setup.rs:141 + bls.rs:169-187; only the boolean is observable and
        both weightings are sound random linear combinations).
        """
        assert len(blobs) == len(commitments) == len(proofs)
        n = len(blobs)
        blob_elements = [blob_from_bytes(b, self.n) for b in blobs]
        comm_pts = [c.g1_decompress(bytes(cm)) for cm in commitments]
        proof_pts = [c.g1_decompress(bytes(p)) for p in proofs]

        challenges = []
        evals = []
        for elements, cm in zip(blob_elements, commitments):
            z = self._challenge(elements, bytes(cm))
            challenges.append(z)
            evals.append(self._evaluate(elements, z))

        # r binds all inputs (c-kzg compute_r_powers style) — deliberate
        # divergence from the reference's domain+sizes-only hash
        # (setup.rs:127-136); see kzg/api.py for the soundness rationale.
        data = (
            RC_DOMAIN
            + self.n.to_bytes(16, "big")
            + n.to_bytes(16, "big")
            + b"".join(bytes(b) for b in blobs)
            + b"".join(bytes(cm) for cm in commitments)
            + b"".join(bytes(p) for p in proofs)
        )
        r = hash_to_fr(data)
        weights = [pow(r, i, R) for i in range(n)]

        proof_lincomb = c.g1_lincomb(proof_pts, weights)
        proof_z_lincomb = c.g1_lincomb(proof_pts, [w * z % R for w, z in zip(weights, challenges)])
        comms_minus_evals = [
            c.g1_add(cm, c.g1_mul(c.g1_neg(c.G1_GEN), y)) for cm, y in zip(comm_pts, evals)
        ]
        cme_lincomb = c.g1_lincomb(comms_minus_evals, weights)

        return pr.verify_pairings(
            (proof_lincomb, self.g2_monomial[1]),
            (c.g1_add(cme_lincomb, proof_z_lincomb), c.G2_GEN),
        )
