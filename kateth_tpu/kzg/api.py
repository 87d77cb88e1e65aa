"""Public byte-level KZG API.

Mirrors the reference's six public operations and their error semantics
(reference src/kzg/setup.rs:96-275): invalid encodings, non-canonical field
elements, off-curve and out-of-subgroup points raise KzgError; `False` is
returned only for an honest verification failure — the distinction the
consensus spec tests enforce.

Host/device split: byte validation masks, polynomial math, MSMs and
pairings run on device as batched jitted kernels; SHA-256 Fiat-Shamir
challenges (reference blob.rs:78-97) and single-point compress/decompress
(48-byte codec, sqrt-dominated) run on the host.

The batched entry points (plural names) are the TPU-native value-add: one
program invocation processes B blobs across the batch dimension.
"""

from __future__ import annotations

import hashlib

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.specs import FR
from ..oracle import curve as oc
from ..oracle.field import R as FR_MOD
from ..oracle.kzg import FS_DOMAIN, RC_DOMAIN, KzgError
from . import protocol
from .config import KzgConfig, MAINNET
from .setup import DeviceSetup

BYTES_PER_FIELD_ELEMENT = 32
BYTES_PER_COMMITMENT = 48
BYTES_PER_PROOF = 48


def _hash_to_fr(data: bytes) -> int:
    """SHA-256 then reduce mod r (reference Fr::hash_to, bls.rs:189-205)."""
    return int.from_bytes(hashlib.sha256(data).digest(), "big") % FR_MOD




#: compressed G1 generator — the always-valid pad point for canonical
#: batch shapes (in-subgroup, so pad lanes pass the folded subgroup check)
_G1_GEN_BYTES = oc.g1_compress(oc.G1_GEN)


class Kzg:
    """The library handle: device setup + compiled kernels.

    Replaces the reference's `Setup` (setup.rs:38-276).
    """

    def __init__(self, setup: DeviceSetup):
        self.setup = setup
        self.config = setup.config
        #: lazily built fixed-base comb table (curves/comb.py) — device
        #: memory is only committed when a commit/prove op first runs
        self._comb_table = None

    def _canon(self, n: int) -> int:
        """Canonical batch shape for a logical batch of n: the next
        multiple of config.canon_batch.

        Every batched op pads its batch up to this, so the heavy fused
        graphs compile for a FIXED small set of shapes (64, 128, ...)
        instead of once per caller batch size — each distinct shape
        costs a multi-minute XLA compile on TPU (round-3 lesson: three
        pairing-bearing graphs ate the bench budget).  Pad lanes carry
        RLC weight 0, a zero blob and generator points, so they
        contribute the identity to every lincomb and pass every validity
        mask; verdicts and error semantics are unchanged.
        """
        cb = self.config.canon_batch
        return cb * -(-max(n, 1) // cb)

    @classmethod
    def load_json(cls, path: str, config: KzgConfig = MAINNET) -> "Kzg":
        return cls(DeviceSetup.load_json(path, config))

    # -- host codecs -----------------------------------------------------

    def _decode_blobs(self, blobs, pad_to: int | None = None):
        """list[bytes] -> (plain element planes (B, N, 16), device ok (B,)).
        Length errors raise immediately; canonicality comes back as a mask.
        With pad_to, zero blobs (canonical) pad the batch so the decode
        graph compiles only for canonical shapes; callers slice [:n]."""
        nbytes = self.config.bytes_per_blob
        for b in blobs:
            if len(b) != nbytes:
                raise KzgError("invalid blob length")
        blobs = list(blobs)
        if pad_to is not None and pad_to > len(blobs):
            blobs += [b"\x00" * nbytes] * (pad_to - len(blobs))
        arr = np.frombuffer(
            b"".join(bytes(b) for b in blobs), dtype=np.uint8
        ).reshape(len(blobs), nbytes)
        return protocol.decode_blobs(jnp.asarray(arr))

    @staticmethod
    def _decode_g1(b: bytes):
        """48 compressed bytes -> oracle Jacobian point (raises KzgError)."""
        if len(b) != BYTES_PER_COMMITMENT:
            raise KzgError("invalid point length")
        try:
            return oc.g1_decompress(bytes(b))
        except oc.DecompressError as e:
            raise KzgError(f"invalid G1 point: {e.__class__.__name__}") from e

    @staticmethod
    def _fr_bytes_to_int(b: bytes) -> int:
        if len(b) != BYTES_PER_FIELD_ELEMENT:
            raise KzgError("invalid field element length")
        v = int.from_bytes(bytes(b), "big")
        if v >= FR_MOD:
            raise KzgError("non-canonical field element")
        return v

    @staticmethod
    def _fr_planes(vals) -> jax.Array:
        return jnp.asarray(np.stack([FR.from_int(v, mont=False) for v in vals]))

    @staticmethod
    def _points_to_bytes(pt) -> list[bytes]:
        """Batched device compression (replaces the round-2 per-point
        oracle.g1_compress host loop — one jitted program for the whole
        batch; reference blst_p1_compress, bls.rs:549)."""
        from ..curves import compress

        return compress.points_to_bytes(pt)

    def _challenge(self, blob: bytes, commitment: bytes) -> int:
        """Fiat-Shamir challenge (reference Blob::challenge, blob.rs:78-97)."""
        data = (
            FS_DOMAIN
            + self.config.n.to_bytes(16, "big")
            + bytes(blob)
            + bytes(commitment)
        )
        return _hash_to_fr(data)

    def _challenge_digests(self, joined_blobs: bytes, joined_comms: bytes, n: int):
        """Batched Fiat-Shamir challenge digests via the native hasher,
        over pre-joined blob/commitment bytes (one copy, reused by the
        caller for the device transfer)."""
        from .. import native

        prefix = FS_DOMAIN + self.config.n.to_bytes(16, "big")
        return native.challenges(
            prefix, joined_blobs, self.config.bytes_per_blob, joined_comms, n
        )

    def _challenges(self, blobs, commitments) -> list[int]:
        """Batched Fiat-Shamir challenges (reduced mod r)."""
        digests = self._challenge_digests(
            b"".join(bytes(b) for b in blobs),
            b"".join(bytes(c) for c in commitments),
            len(blobs),
        )
        return [int.from_bytes(d, "big") % FR_MOD for d in digests]

    def _check_ok(self, ok: jax.Array):
        if not bool(jnp.all(ok)):
            raise KzgError("non-canonical field element in blob")

    # -- batched core ------------------------------------------------------

    #: blobs per commit device program.  The batch axis is native to the
    #: kernel (vmap over the MSM MISCOMPILES on XLA:TPU — all commitments
    #: come out wrong while each single-blob program is bit-exact;
    #: explicit batch axes are both correct and amortize dispatch
    #: overhead).  The comb path's per-column working set is
    #: O(chunk * N) gathered table rows (~50 MB at 64), the windowed
    #: fallback's is O(chunk * N) point lanes (~300 MB), so the chunk
    #: matches the canonical batch quantum and a 64-blob commit is ONE
    #: program invocation.
    commit_chunk = 64

    def _use_comb(self) -> bool:
        import os

        return self.config.comb_h > 0 and os.environ.get("KATETH_NO_COMB") != "1"

    def _commit_one(self, chunk: jax.Array):
        """One canonical-shape commit program: the fixed-base comb path
        (curves/comb.py) by default, the windowed Pippenger as the
        kill-switch fallback (KATETH_NO_COMB=1 / comb_h=0)."""
        if self._use_comb():
            if self._comb_table is None:
                from ..curves import comb, ops

                self._comb_table = comb.build_table(
                    ops.FP_FIELD, self.setup.g1_points, self.config.comb_h
                )
            return protocol.commit_comb(
                self._comb_table, chunk, self.config.comb_h, self.config.n
            )
        return protocol.commit_msm(
            self.setup.g1_points, chunk, self.config.msm_window
        )

    def _commit_elements(self, elements_plain: jax.Array):
        B = elements_plain.shape[0]
        if B <= self.commit_chunk:
            return self._commit_one(elements_plain)
        outs = []
        for i in range(0, B, self.commit_chunk):
            chunk = elements_plain[i : i + self.commit_chunk]
            pad = 0
            if chunk.shape[0] < self.commit_chunk:
                pad = self.commit_chunk - chunk.shape[0]
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad, *chunk.shape[1:]), chunk.dtype)], axis=0
                )
            out = self._commit_one(chunk)
            outs.append(tuple(c[: self.commit_chunk - pad] for c in out))
        return tuple(jnp.concatenate([o[i] for o in outs], axis=0) for i in range(3))

    def _evaluate_and_quotient(self, elements_plain: jax.Array, z_vals):
        """(B,N,16) plain elements + python z ints -> (y ints, q plain)."""
        elements_mont = protocol.fr_to_mont(elements_plain)
        z_mont = protocol.fr_to_mont(self._fr_planes(z_vals))
        y_mont = protocol.evaluate(
            elements_mont, z_mont, self.setup.roots, self.config.n
        )
        q_mont = protocol.quotient(
            elements_mont, z_mont, y_mont, self.setup.roots, self.setup.inv_roots
        )
        y_plain = np.asarray(protocol.fr_from_mont(y_mont))
        q_plain = protocol.fr_from_mont(q_mont)
        ys = [FR.to_int(y_plain[i], mont=False) for i in range(y_plain.shape[0])]
        return ys, q_plain

    # -- the six public operations (reference setup.rs:96-275) -------------

    def blob_to_kzg_commitment(self, blob: bytes) -> bytes:
        return self.blobs_to_kzg_commitments([blob])[0]

    def blobs_to_kzg_commitments(self, blobs) -> list[bytes]:
        """Batched commitment (reference setup.rs:167-171)."""
        n = len(blobs)
        elements, ok = self._decode_blobs(blobs, pad_to=self._canon(n))
        self._check_ok(ok[:n])
        return self._points_to_bytes(self._commit_elements(elements))[:n]

    def compute_kzg_proof(self, blob: bytes, z: bytes) -> tuple[bytes, bytes]:
        (proof,), (y,) = self.compute_kzg_proofs([blob], [z])
        return proof, y

    def compute_kzg_proofs(self, blobs, zs):
        """Batched proof-at-point (reference setup.rs:185-194).
        Returns (proofs list, ys list) of bytes."""
        if len(blobs) != len(zs):
            raise KzgError("length mismatch")
        n = len(blobs)
        nc = self._canon(n)
        elements, ok = self._decode_blobs(blobs, pad_to=nc)
        self._check_ok(ok[:n])
        z_vals = [self._fr_bytes_to_int(z) for z in zs] + [0] * (nc - n)
        ys, q_plain = self._evaluate_and_quotient(elements, z_vals)
        proofs = self._points_to_bytes(self._commit_elements(q_plain))[:n]
        return proofs, [v.to_bytes(32, "big") for v in ys[:n]]

    def compute_blob_kzg_proof(self, blob: bytes, commitment: bytes) -> bytes:
        return self.compute_blob_kzg_proofs([blob], [commitment])[0]

    def _validate_g1_device(self, points) -> None:
        """Batched commitment/proof validation on device (decompression
        kernel incl. subgroup check) — replaces per-point host decode.
        The batch pads to a canonical shape with generator bytes."""
        for p in points:
            if len(p) != BYTES_PER_COMMITMENT:
                raise KzgError("invalid point length")
        from ..curves import decompress

        n = len(points)
        padded = list(points) + [_G1_GEN_BYTES] * (self._canon(n) - n)
        arr = jnp.asarray(
            np.frombuffer(b"".join(bytes(p) for p in padded), dtype=np.uint8).reshape(
                len(padded), BYTES_PER_COMMITMENT
            )
        )
        _, ok_enc, ok_curve, ok_sub = jax.device_get(decompress.g1_decompress(arr))
        self._raise_point_masks((ok_enc[:n], ok_curve[:n], ok_sub[:n]))

    def compute_blob_kzg_proofs(self, blobs, commitments) -> list[bytes]:
        """Batched blob proof (reference setup.rs:177-183)."""
        if len(blobs) != len(commitments):
            raise KzgError("length mismatch")
        # validation only (setup.rs:179-180), on device
        self._validate_g1_device(commitments)
        n = len(blobs)
        nc = self._canon(n)
        elements, ok = self._decode_blobs(blobs, pad_to=nc)
        self._check_ok(ok[:n])
        z_vals = self._challenges(blobs, commitments) + [0] * (nc - n)
        _, q_plain = self._evaluate_and_quotient(elements, z_vals)
        return self._points_to_bytes(self._commit_elements(q_plain))[:n]

    # -- polynomial form conversion (no reference analog: the reference
    # never leaves Lagrange form; this is the NTT component's consumer) --

    @staticmethod
    def _fr_planes_to_byteslists(plain) -> list[list[bytes]]:
        """(B, N, 16) plain LE digit planes -> per-blob lists of 32-byte
        big-endian scalars (vectorized; no per-element Python ints)."""
        arr = np.asarray(plain).astype(np.uint16)[..., ::-1]  # MSB digit first
        raw = arr.astype(">u2").tobytes()
        B, N = arr.shape[0], arr.shape[1]
        return [
            [raw[(b * N + i) * 32 : (b * N + i) * 32 + 32] for i in range(N)]
            for b in range(B)
        ]

    def blobs_to_coefficients(self, blobs) -> list[list[bytes]]:
        """Blobs (evaluation form over BRP'd roots) -> monomial
        coefficients (ascending degree), 32-byte big-endian each.

        Backed by the radix-2 inverse NTT (kateth_tpu/ntt.py); the
        distributed variant rides parallel.ntt.sharded_ntt_from_brp."""
        from .. import ntt

        n = len(blobs)
        # canonical batch shape like every other batched op: zero-blob pad
        # lanes keep the NTT graph compiling for one fixed shape per
        # quantum instead of once per caller batch size
        elements, ok = self._decode_blobs(blobs, pad_to=self._canon(n))
        self._check_ok(ok[:n])
        cm = ntt.lagrange_brp_to_monomial(protocol.fr_to_mont(elements))
        return self._fr_planes_to_byteslists(protocol.fr_from_mont(cm))[:n]

    def coefficients_to_blobs(self, coeffs) -> list[bytes]:
        """Monomial coefficients (per-blob lists of 32-byte BE scalars,
        ascending degree) -> blobs in the EIP-4844 evaluation layout.
        Non-canonical coefficients raise KzgError."""
        from .. import ntt

        n = self.config.n
        for cs in coeffs:
            if len(cs) != n:
                raise KzgError("invalid coefficient count")
        joined = [b"".join(bytes(c) for c in cs) for cs in coeffs]
        nb = len(joined)
        # same canonicality rules as blobs; canonical batch shape as above
        elements, ok = self._decode_blobs(joined, pad_to=self._canon(nb))
        self._check_ok(ok[:nb])
        ev = ntt.monomial_to_lagrange_brp(protocol.fr_to_mont(elements))
        lists = self._fr_planes_to_byteslists(protocol.fr_from_mont(ev))
        return [b"".join(cs) for cs in lists[:nb]]

    def verify_kzg_proof(self, proof: bytes, commitment: bytes, z: bytes, y: bytes) -> bool:
        """Single-point verification (reference setup.rs:96-113).

        Point decode/validation runs ON DEVICE (decompression kernel +
        subgroup checks folded into the y*G1 ladder) — no host
        oracle.curve work on this path."""
        for b in (proof, commitment):
            if len(b) != BYTES_PER_COMMITMENT:
                raise KzgError("invalid point length")
        z_v = self._fr_bytes_to_int(z)
        y_v = self._fr_bytes_to_int(y)
        pa = jnp.asarray(np.frombuffer(bytes(proof), dtype=np.uint8)[None, :])
        ca = jnp.asarray(np.frombuffer(bytes(commitment), dtype=np.uint8)[None, :])
        a1, a2, b1, proof_masks, comm_masks = protocol.verify_kzg_bytes(
            pa, ca, self._fr_planes([z_v]), self._fr_planes([y_v]), self.setup.tau2
        )
        verdict, proof_masks, comm_masks = jax.device_get(
            (protocol.pairing_check(a1, a2, b1), proof_masks, comm_masks)
        )
        # proof first, then commitment — the reference's decode order
        # (setup.rs:101-106)
        self._raise_point_masks(proof_masks)
        self._raise_point_masks(comm_masks)
        return bool(verdict[0])

    def verify_blob_kzg_proof(self, blob: bytes, commitment: bytes, proof: bytes) -> bool:
        """(reference setup.rs:208-221)."""
        return self.verify_blob_kzg_proof_batch([blob], [commitment], [proof])

    def verify_blob_kzg_proof_batch(self, blobs, commitments, proofs) -> bool:
        """RLC batch verification (reference setup.rs:247-275 + 115-161).

        Weights are true powers r^0=1, r, r^2, ... (documented divergence
        from the reference's rpowers[0]==r quirk, setup.rs:141; the boolean
        is unaffected — both are sound random linear combinations).
        """
        pending = self._verify_batch_dispatch(blobs, commitments, proofs)
        return self._verify_batch_finalize(pending)

    def verify_blob_kzg_proof_batches(self, batches) -> list[bool]:
        """STREAMING batch verification: `batches` is an iterable of
        (blobs, commitments, proofs) triples; returns one verdict per
        batch.

        All device programs are dispatched before any result is awaited,
        so the host->device transfer of batch k+1 overlaps the device
        compute of batch k (JAX async dispatch).  Over a remote device
        link the transfer is the throughput wall — the fused compute for
        64 mainnet blobs is ~50 ms while the 8.4 MB of blob bytes take
        100-250 ms to ship — so pipelining roughly doubles sustained
        proofs/s.  This is the serving-shaped entry point with no
        reference counterpart (the reference is single-threaded,
        setup.rs:247).

        Error semantics are SEQUENTIAL-EQUIVALENT: if any batch holds an
        invalid input, the KzgError raised is the one a loop of
        `verify_blob_kzg_proof_batch` calls would raise — the error of
        the EARLIEST bad batch, whether it is detected host-side at
        dispatch (lengths) or device-side at finalize (canonicality /
        point validity) — and no verdicts are returned.  Pipelining never
        reorders which error callers observe.
        """
        # Dispatch everything first (the pipelining), but capture a
        # host-side error so an early batch's device-side error can still
        # win the ordering race at finalize time.
        pendings = []
        dispatch_error: KzgError | None = None
        for (b, c, p) in batches:
            try:
                pendings.append(self._verify_batch_dispatch(b, c, p))
            except KzgError as e:
                dispatch_error = e
                break
        # Finalize in batch order: the first device-side KzgError (from a
        # batch BEFORE the dispatch failure) raises here, preserving the
        # sequential order of errors.
        verdicts = [self._verify_batch_finalize(p) for p in pendings]
        if dispatch_error is not None:
            raise dispatch_error
        return verdicts

    def _rlc_challenge(self, z_digests, joined_comms, joined_proofs, n: int) -> int:
        """SECURITY-RELEVANT Fiat-Shamir: the batch RLC challenge r.

        Binds ALL inputs (blobs, commitments, proofs), like
        c-kzg/EIP-4844 compute_r_powers.  Deliberate divergence from the
        reference, which hashes only the domain + sizes
        (setup.rs:127-136): with predictable weights an attacker can
        craft two invalid triples whose pairing errors cancel, making the
        batch check pass where per-item verification fails.  The blobs
        enter through the per-blob challenge DIGESTS
        z_i = H(domain || blob_i || comm_i) rather than a second full
        pass over the raw bytes — the digests are fixed-width so the
        concatenation is injective, SHA-256 collision resistance
        composes, and it saves an 8.4 MB SHA-256 pass (~19 ms/batch) on
        the hot path.  Honest-path booleans and the spec vectors are
        unaffected.  tests/test_kzg_api.py pins the blob binding (two
        batches differing only in one blob byte must draw different r).
        """
        return _hash_to_fr(
            RC_DOMAIN
            + self.config.n.to_bytes(16, "big")
            + n.to_bytes(16, "big")
            + b"".join(z_digests)
            + joined_comms
            + joined_proofs
        )

    def _verify_batch_dispatch(self, blobs, commitments, proofs):
        """Host prefix + async device dispatch; returns (n, verdict_dev,
        packed_masks_dev) or n == 0 sentinel without touching the device."""
        n, args = self._verify_batch_stage(blobs, commitments, proofs)
        if n == 0:
            return (0, None, None)
        pc_in, packed = protocol.verify_blob_batch_fused(*args)
        verdict = protocol.pairing_check(*pc_in)[0]
        return (n, verdict, packed)

    def _verify_batch_stage(self, blobs, commitments, proofs):
        """Host prefix of batch verification: validation, Fiat-Shamir,
        padded device transfers.  Returns (n, fused-graph args) — the
        compute-only bench (bench.py) stages once and re-dispatches."""
        if not (len(blobs) == len(commitments) == len(proofs)):
            raise KzgError("length mismatch")
        n = len(blobs)
        if n == 0:
            return (0, None)
        nbytes = self.config.bytes_per_blob
        for b in blobs:
            if len(b) != nbytes:
                raise KzgError("invalid blob length")
        for p in list(commitments) + list(proofs):
            if len(p) != BYTES_PER_COMMITMENT:
                raise KzgError("invalid point length")

        # ONE join of each input (reused for transfer + hashing), and the
        # padded device transfers started FIRST: jnp.asarray is async, so
        # the 8.4 MB blob upload overlaps the host-side SHA-256 work below
        # (~35 ms of host prefix hides behind the transfer + dispatch)
        nc = self._canon(n)
        pad = nc - n
        joined_blobs = b"".join(bytes(b) for b in blobs)
        joined_comms = b"".join(bytes(c) for c in commitments)
        joined_proofs = b"".join(bytes(p) for p in proofs)
        # pad lanes: weight-0, zero blob (canonical), generator points
        # (valid, in-subgroup) — they contribute the identity to every
        # lincomb and pass every mask
        blob_arr = jnp.asarray(
            np.frombuffer(
                joined_blobs + b"\x00" * (nbytes * pad), dtype=np.uint8
            ).reshape(nc, nbytes)
        )
        comm_arr = jnp.asarray(
            np.frombuffer(joined_comms + _G1_GEN_BYTES * pad, dtype=np.uint8).reshape(
                nc, 48
            )
        )
        proof_arr = jnp.asarray(
            np.frombuffer(joined_proofs + _G1_GEN_BYTES * pad, dtype=np.uint8).reshape(
                nc, 48
            )
        )

        z_digests = self._challenge_digests(joined_blobs, joined_comms, n)
        z_vals = [int.from_bytes(d, "big") % FR_MOD for d in z_digests]
        r = self._rlc_challenge(z_digests, joined_comms, joined_proofs, n)
        weights = [pow(r, i, FR_MOD) for i in range(n)] + [0] * pad
        z_vals = z_vals + [0] * pad
        zw = [w * z % FR_MOD for w, z in zip(weights, z_vals)]

        return (
            n,
            (
                blob_arr,
                comm_arr,
                proof_arr,
                self._fr_planes(z_vals),
                self._fr_planes(zw),
                self._fr_planes(weights),
                self.setup.roots,
                self.setup.tau2,
            ),
        )

    def _verify_batch_finalize(self, pending) -> bool:
        n, verdict_dev, packed_dev = pending
        if n == 0:
            return True
        # ONE host sync: verdict + the (7, B) packed validity plane
        verdict, m = jax.device_get((verdict_dev, packed_dev))
        # blob canonicality is reported before point validity, mirroring the
        # reference's validation order (setup.rs:259-261); pad lanes sliced off
        if not m[0, :n].all():
            raise KzgError("non-canonical field element in blob")
        self._raise_point_masks((m[1, :n], m[2, :n], m[3, :n]))
        self._raise_point_masks((m[4, :n], m[5, :n], m[6, :n]))
        return bool(verdict)

    @staticmethod
    def _raise_point_masks(masks):
        """(ok_encoding, ok_curve, ok_subgroup) host arrays -> KzgError,
        mirroring the oracle's BadEncoding/NotOnCurve/NotInGroup split."""
        ok_enc, ok_curve, ok_sub = masks
        if not ok_enc.all():
            raise KzgError("invalid G1 point: BadEncoding")
        if not ok_curve.all():
            raise KzgError("invalid G1 point: NotOnCurve")
        if not ok_sub.all():
            raise KzgError("invalid G1 point: NotInGroup")
