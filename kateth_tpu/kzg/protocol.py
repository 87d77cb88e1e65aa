"""Device kernels for the KZG protocol layer.

Each function is a pure, jittable, batch-first program over digit planes.
Reference anchors:

* decode_blobs      — Blob::from_slice per-element canonicality validation
                      (reference src/blob.rs:26-37)
* evaluate          — Polynomial::evaluate barycentric formula with the
                      root-hit special case (reference src/kzg/poly.rs:10-33),
                      but with ONE Montgomery-trick batched inversion for the
                      whole (B, N) plane instead of 4096 per-term inversions.
* quotient          — Polynomial::prove quotient construction including the
                      O(N) special-case row when z hits a root
                      (reference src/kzg/poly.rs:44-66), as masked passes.
* commit_msm        — the Pippenger MSM call (reference src/blob.rs:48-53,
                      poly.rs:68).
* verify_kzg        — the two-pairing check (reference setup.rs:84-94).
* verify_blob_batch_fused — the random-linear-combination batch check
                      (reference setup.rs:115-161) fused with decode/
                      decompress/evaluate into one device program, with
                      true r^0 = 1 weights (documented divergence from
                      the reference's rpowers[0] == r quirk, setup.rs:141;
                      the boolean outcome — the only observable — is
                      unaffected).

Everything is branch-free: special cases are masks, not control flow.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limbs as L
from ..fields.specs import FP, FR
from ..curves import ops, msm as msm_mod, decompress
from ..curves import g1 as g1mod, g2 as g2mod
from .. import pairing
from .config import KzgConfig

F1 = ops.FP_FIELD
F2 = ops.FP2_FIELD


# ---------------------------------------------------------------------------
# blob decoding / validation
# ---------------------------------------------------------------------------

def decode_blobs(blob_bytes: jax.Array):
    """(B, 32*N) u8 -> (elements_plain (B, N, 16), ok (B,)).

    ok[b] is True iff every 32-byte chunk is a canonical big-endian Fr
    (reference Blob::from_slice, blob.rs:26-37).  Elements are PLAIN
    (non-Montgomery) digit planes; non-canonical lanes are garbage but
    masked by ok.
    """
    B = blob_bytes.shape[0]
    chunks = blob_bytes.reshape(B, -1, 32)
    digits = L.be_bytes_to_digits(FR, chunks)  # (B, N, 16)
    ok = jnp.all(L.lt_modulus(FR, digits), axis=-1)
    return digits, ok


# ---------------------------------------------------------------------------
# polynomial math (evaluation form over BRP'd roots)
# ---------------------------------------------------------------------------

def _n_inv_mont(n: int) -> np.ndarray:
    from ..oracle.field import R

    return FR.from_int(pow(n, R - 2, R))


@partial(jax.jit, static_argnums=(3,))
def evaluate(elements_mont, z_mont, setup_roots, n: int):
    """Barycentric evaluation y = p(z) (reference poly.rs:10-33) with NO
    field inversion.

    The reference computes y = [sum_i f_i w_i / (z - w_i)] * (z^N - 1)/N.
    Since the w_i are exactly the N-th roots of unity, prod_i (z - w_i)
    = z^N - 1, so with per-index prefix/suffix products of (z - w_i)

        sum_i f_i w_i / (z - w_i) * (z^N - 1)
            = sum_i f_i w_i * prefix_{i-1} * suffix_{i+1}

    and the closing factor cancels the batched-inversion total exactly:
    y = N^{-1} * sum_i f_i w_i prefix_{i-1} suffix_{i+1}.  This drops the
    255-bit Fermat chain AND the z^N squaring ladder from the hot verify/
    prove paths (the scans were already paid inside batch_inv).

    elements_mont: (B, N, 16) Montgomery; z_mont: (B, 16) Montgomery.
    Returns y_mont (B, 16).
    """
    roots = setup_roots  # (N, 16) Montgomery, BRP order
    hit = L.eq(z_mont[:, None, :], roots[None, :, :])  # (B, N)
    any_hit = jnp.any(hit, axis=-1)  # (B,)
    y_hit = L.sum_mod(
        FR, jnp.where(hit[..., None], elements_mont, jnp.zeros_like(elements_mont)), axis=-2
    )
    d = L.sub(FR, z_mont[:, None, :], jnp.broadcast_to(roots, elements_mont.shape))
    # root-hit lanes have one zero factor; mask it to 1 — the whole lane's
    # result is replaced by y_hit below, masking keeps the scans nonzero
    one = jnp.broadcast_to(jnp.asarray(FR.one_mont, jnp.uint32), d.shape)
    safe = jnp.where(hit[..., None], one, d)
    mul = partial(L.mont_mul, FR)
    ax = safe.ndim - 2  # associative_scan(reverse=...) needs nonneg axis
    prefix = jax.lax.associative_scan(mul, safe, axis=ax)
    suffix = jax.lax.associative_scan(mul, safe, reverse=True, axis=ax)
    ones_row = one[..., :1, :]
    prefix_shift = jnp.concatenate(
        [ones_row, jax.lax.slice_in_dim(prefix, 0, n - 1, axis=ax)], axis=ax
    )
    suffix_shift = jnp.concatenate(
        [jax.lax.slice_in_dim(suffix, 1, n, axis=ax), ones_row], axis=ax
    )
    fw = mul(elements_mont, jnp.broadcast_to(roots, elements_mont.shape))
    terms = mul(mul(fw, prefix_shift), suffix_shift)
    s = L.sum_mod(FR, terms, axis=-2)  # (B, 16)
    ninv = jnp.broadcast_to(jnp.asarray(_n_inv_mont(n), jnp.uint32), s.shape)
    y = mul(s, ninv)
    return jnp.where(any_hit[..., None], y_hit, y)


@jax.jit
def quotient(elements_mont, z_mont, y_mont, setup_roots, setup_inv_roots):
    """Quotient polynomial q_i = (f_i - y)/(w_i - z) with the masked
    special-case row when z == w_hit (reference poly.rs:44-66).

    Returns q_mont (B, N, 16).
    """
    roots = setup_roots
    B = elements_mont.shape[0]
    rootsb = jnp.broadcast_to(roots, elements_mont.shape)
    hit = L.eq(z_mont[:, None, :], roots[None, :, :])  # (B, N)
    d = L.sub(FR, rootsb, z_mont[:, None, :])  # (w_i - z)
    invs = L.batch_inv(FR, d, axis=-2)  # hit lane -> 0
    fy = L.sub(FR, elements_mont, jnp.broadcast_to(y_mont[:, None, :], elements_mont.shape))
    q = L.mont_mul(FR, fy, invs)
    # special row: q_hit = (sum_j (f_j - y) w_j inv(w_hit - w_j)) / w_hit
    #            = -(sum_j (f_j - y) w_j invs_j) * inv_root_hit   (invs_hit = 0)
    t = L.mont_mul(FR, L.mont_mul(FR, fy, rootsb), invs)
    s = L.neg(FR, L.sum_mod(FR, t, axis=-2))  # (B, 16)
    inv_hit = L.sum_mod(
        FR,
        jnp.where(hit[..., None], jnp.broadcast_to(setup_inv_roots, elements_mont.shape),
                  jnp.zeros_like(elements_mont)),
        axis=-2,
    )
    q_hit = L.mont_mul(FR, s, inv_hit)  # (B, 16)
    return jnp.where(hit[..., None], q_hit[:, None, :], q)


# ---------------------------------------------------------------------------
# MSM / commitments
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(2,))
def commit_msm(g1_points, scalars_plain, window: int = 8):
    """Batched Pippenger commitment: (B, N, 16) plain scalars against the
    (N,)-point table -> batched projective G1 points (each coord (B, 24)).
    The batch axis is native to the MSM (one program, no vmap — see
    msm.msm).  (reference blob.rs:48-53 / poly.rs:68 -> bls.rs:415-437)."""
    return msm_mod.msm(F1, g1_points, scalars_plain, c=window)


@partial(jax.jit, static_argnums=(2, 3))
def commit_comb(table, scalars_plain, h: int, n: int):
    """Batched FIXED-BASE comb commitment (curves/comb.py): (B, N, 16)
    plain scalars against the precomputed (N * 2^h, 48) comb row table ->
    batched projective G1 points.  The round-5 commit hot path; the
    windowed commit_msm above remains the arbitrary-point / kill-switch
    fallback.  (reference blob.rs:48-53 / poly.rs:68 -> bls.rs:415-437)."""
    from ..curves import comb

    return comb.commit(F1, table, scalars_plain, h, n)


# ---------------------------------------------------------------------------
# verification
# ---------------------------------------------------------------------------

def _ladder_g2(point, scalar_plain):
    """Per-lane G2 scalar multiply: the whole-chain Pallas kernel on TPU
    (one launch for 256 steps), the XLA scan elsewhere."""
    if jax.default_backend() != "cpu" and not L._NO_PALLAS:
        from .. import pallas_pairing

        return pallas_pairing.g2_scalar_mul(point, scalar_plain)
    import os

    if os.environ.get("KATETH_PALLAS_INTERPRET") == "1":
        from .. import pallas_pairing

        return pallas_pairing.g2_scalar_mul(point, scalar_plain)
    return ops.scalar_mul(F2, point, scalar_plain)


@jax.jit
def pairing_check(a1, a2, b1):
    """e(a1, a2) == e(b1, [1]_2) as its OWN top-level program.

    Both verify paths end in exactly this check with identical tiny
    shapes (B=1: two Miller lanes, one product lane), so keeping it out
    of the fused byte-level programs means the Miller + hard-part Pallas
    kernels — by far the most expensive axon AOT compiles, ~20 min
    (TPU_KERNEL_CHECK.json) — compile ONCE per process and are reused by
    every batch size, instead of once per fused graph.  Dispatch chains
    asynchronously after the fused program; no extra host sync.
    """
    B = a1[0].shape[0]
    g2gen = tuple(jnp.broadcast_to(g, (B, *g.shape)) for g in g2mod.GENERATOR)
    return pairing.verify_pairings((a1, a2), (b1, g2gen))


@jax.jit
def verify_kzg_bytes(proof_bytes, comm_bytes, z_plain, y_plain, tau2):
    """Single-point verification pre-pairing program (reference
    setup.rs:84-113): decompresses proof + commitment (curve check), folds
    both subgroup checks into the y*G1 ladder, runs the G2 z-ladder as a
    whole-chain kernel on TPU.

    Returns (a1, a2, b1, proof masks, commitment masks) — feed the first
    three to `pairing_check` for the verdict; masks = (ok_encoding,
    ok_curve, ok_subgroup); the caller raises KzgError.
    """
    B = z_plain.shape[0]
    both = jnp.concatenate([proof_bytes, comm_bytes], axis=0)
    pts, enc_ok, curve_ok = decompress.g1_decompress_nosub(both)
    proof_pt = tuple(a[:B] for a in pts)
    comm_pt = tuple(a[B:] for a in pts)
    # ONE G1 ladder: [(-G1)*y | subgroup r*(proof ++ comm)]
    neg_g1 = tuple(
        jnp.broadcast_to(c, (B, *c.shape)) for c in ops.pneg(F1, g1mod.GENERATOR)
    )
    lanes = tuple(jnp.concatenate([g, a], axis=0) for g, a in zip(neg_g1, pts))
    sc = jnp.concatenate(
        [
            y_plain,
            jnp.broadcast_to(jnp.asarray(_R_DIGITS, jnp.uint32), (2 * B, FR.n_digits)),
        ],
        axis=0,
    )
    prods = _ladder(lanes, sc)
    yg1 = tuple(a[:B] for a in prods)
    sub_ok = ops.is_identity(F1, tuple(a[B:] for a in prods))  # (2B,)
    b1 = ops.padd(F1, comm_pt, yg1)
    neg_g2 = tuple(
        jnp.broadcast_to(c, (B, *c.shape)) for c in ops.pneg(F2, g2mod.GENERATOR)
    )
    zg2 = _ladder_g2(neg_g2, z_plain)
    tau2b = tuple(jnp.broadcast_to(t, (B, *t.shape)) for t in tau2)
    a2 = ops.padd(F2, tau2b, zg2)
    return (
        proof_pt,
        a2,
        b1,
        (enc_ok[:B], curve_ok[:B], sub_ok[:B]),
        (enc_ok[B:], curve_ok[B:], sub_ok[B:]),
    )


_R_DIGITS = L.int_to_digits(FR.modulus, FR.n_digits)


def _ladder(pts, sc):
    """Per-lane G1 scalar multiply: the Pallas whole-chain kernel on TPU
    (one launch for the full 256-step ladder), the XLA scan elsewhere."""
    if jax.default_backend() != "cpu" and not L._NO_PALLAS:
        from ..fields import pallas_mont as PM
        from ..fields.specs import FP

        return PM.g1_scalar_mul(FP, FP.one_mont, pts, sc)
    return ops.scalar_mul(F1, pts, sc)


@jax.jit
def verify_blob_batch_fused(
    blob_bytes, comm_bytes, proof_bytes, z_plain, zw_plain, w_plain, roots, tau2
):
    """The ENTIRE batch verification as ONE device program.

    Fuses blob decode/validation, G1 decompression of commitments and
    proofs (incl. curve + subgroup checks), Montgomery lifts, barycentric
    evaluation, the C_i - y_i G1 combination, the 3-in-1 RLC lincomb and
    the final pairing check (reference setup.rs:247-275 + 115-161).

    One dispatch matters: the host<->device round trip costs 150-300 ms
    over the axon tunnel, so the unfused 6-dispatch pipeline spent more
    time in transit than in compute.

    Host precomputes (byte joins, SHA-256 Fiat-Shamir challenges z, RLC
    weights w and z*w) arrive as plain digit planes.  Returns
    ((a1, a2, b1) pairing-check inputs, ok_blob (B,), comm validity
    masks, proof validity masks); the caller feeds the first triple to
    `pairing_check` (kept out of this graph so the expensive pairing
    kernels compile once per process) and raises KzgError from the masks.
    """
    B = blob_bytes.shape[0]
    elements, ok_blob = decode_blobs(blob_bytes)
    # ONE decompression pass (sqrt chain + flag checks) over comm ++ proof
    both = jnp.concatenate([comm_bytes, proof_bytes], axis=0)
    pts, enc_ok, curve_ok = decompress.g1_decompress_nosub(both)
    comm_pt = tuple(a[:B] for a in pts)
    proof_pt = tuple(a[B:] for a in pts)
    elements_mont = L.to_mont(FR, elements)
    z_mont = L.to_mont(FR, z_plain)
    n = roots.shape[0]
    y_mont = evaluate(elements_mont, z_mont, roots, n)
    # sum w_i (C_i - y_i G) = sum w_i C_i - (sum w_i y_i) G: the y_i G
    # ladder collapses into ONE extra lane with the Fr dot product
    # sum w_i y_i as its scalar (reference setup.rs:140-155 computes the
    # C_i - y_i G points explicitly; the algebra is equivalent)
    w_mont = L.to_mont(FR, w_plain)
    wy = L.mont_mul(FR, w_mont, y_mont)  # (B, 16)
    pot = 1 if B <= 1 else 1 << (B - 1).bit_length()
    if pot != B:
        wy = jnp.concatenate(
            [wy, jnp.zeros((pot - B, wy.shape[-1]), wy.dtype)], axis=0
        )
    s_plain = L.from_mont(FR, L.sum_mod(FR, wy, axis=-2))  # (16,)
    neg_g1 = tuple(c[None] for c in ops.pneg(F1, g1mod.GENERATOR))
    # ONE ladder: [proof*w | comm*w | proof*zw | (-G)*sum(wy) | subgroup r*P]
    lanes = tuple(
        jnp.concatenate([p, c, p, g, c, p], axis=0)
        for p, c, g in zip(proof_pt, comm_pt, neg_g1)
    )
    sc = jnp.concatenate(
        [
            w_plain,
            w_plain,
            zw_plain,
            s_plain[None],
            jnp.broadcast_to(jnp.asarray(_R_DIGITS, jnp.uint32), (2 * B, FR.n_digits)),
        ],
        axis=0,
    )
    prods = _ladder(lanes, sc)
    lin = tuple(a[: 3 * B].reshape(3, B, *a.shape[1:]) for a in prods)
    sums = msm_mod.tree_sum(F1, lin, axis=1)
    lhs1 = tuple(a[0] for a in sums)
    sG = tuple(a[3 * B] for a in prods)
    lhs2 = ops.padd(F1, tuple(a[1] for a in sums), sG)
    sub_ok = ops.is_identity(F1, tuple(a[3 * B + 1 :] for a in prods))
    # subgroup lanes are ordered [comm | proof]
    rhs = ops.padd(F1, lhs2, tuple(a[2] for a in sums))
    lhs1 = tuple(c[None] for c in lhs1)
    rhs = tuple(c[None] for c in rhs)
    tau2b = tuple(c[None] for c in tau2)
    # ONE packed validity plane: each device_get of a separate small array
    # costs a host round trip (25-50 ms total over remote links for the
    # seven masks), so they ship as a single (7, B) bool fetch.
    # Rows: [ok_blob, comm enc/curve/subgroup, proof enc/curve/subgroup].
    packed = jnp.stack(
        [
            ok_blob,
            enc_ok[:B], curve_ok[:B], sub_ok[:B],
            enc_ok[B:], curve_ok[B:], sub_ok[B:],
        ]
    )
    return ((lhs1, tau2b, rhs), packed)


# ---------------------------------------------------------------------------
# Montgomery codecs for Fr planes
# ---------------------------------------------------------------------------

@jax.jit
def fr_to_mont(x_plain):
    return L.to_mont(FR, x_plain)


@jax.jit
def fr_from_mont(x_mont):
    return L.from_mont(FR, x_mont)
