"""Device G1 decompression vs the oracle (flags, errors, subgroup)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kateth_tpu.curves import decompress, g1 as g1mod, ops
from kateth_tpu.oracle import curve as oc
from kateth_tpu.oracle import field as of


def _dev(comp_list):
    arr = jnp.asarray(
        np.frombuffer(b"".join(comp_list), dtype=np.uint8).reshape(len(comp_list), 48)
    )
    pt, ok_enc, ok_curve, ok_sub = decompress.g1_decompress(arr)
    return (
        g1mod.to_oracle(pt),
        np.asarray(ok_enc),
        np.asarray(ok_curve),
        np.asarray(ok_sub),
    )


def test_valid_points_roundtrip():
    pts = [oc.g1_mul(oc.G1_GEN, k) for k in (1, 2, 3, 7, 12345, of.R - 1)]
    comp = [oc.g1_compress(p) for p in pts]
    got, ok_enc, ok_curve, ok_sub = _dev(comp)
    assert ok_enc.all() and ok_curve.all() and ok_sub.all()
    for g, p in zip(got, pts):
        want = oc.jac_to_affine(oc.FP_OPS, p)
        assert (g[0], g[1]) == want


def test_infinity():
    comp = [bytes([0xC0] + [0] * 47)]
    got, ok_enc, ok_curve, ok_sub = _dev(comp)
    assert ok_enc.all() and ok_curve.all() and ok_sub.all()
    assert got[0] == oc.g1_infinity()


def test_bad_encodings():
    good = oc.g1_compress(oc.G1_GEN)
    no_c_flag = bytes([good[0] & 0x7F]) + good[1:]          # compressed bit unset
    inf_nonzero = bytes([0xC0]) + b"\x01" + bytes(46)        # infinity with x != 0
    inf_signed = bytes([0xE0]) + bytes(47)                   # infinity with sign bit
    x_too_big = bytes([0x9F]) + b"\xff" * 47                 # x >= p
    comp = [no_c_flag, inf_nonzero, inf_signed, x_too_big]
    _, ok_enc, _, _ = _dev(comp)
    assert not ok_enc.any()
    for b in comp:
        with pytest.raises(oc.BadEncoding):
            oc.g1_decompress(b)


def test_off_curve_and_out_of_subgroup():
    # find an x with no sqrt (off-curve) and an on-curve point outside G1
    off = None
    outside = None
    x = 1
    while off is None or outside is None:
        y2 = (x * x % of.P * x + 4) % of.P
        y = oc.fp_sqrt(y2)
        comp = bytearray(x.to_bytes(48, "big"))
        comp[0] |= 0x80
        if y is None:
            off = off or bytes(comp)
        else:
            pt = (x, y, 1)
            if not oc.g1_in_subgroup(pt):
                outside = outside or bytes(comp)
        x += 1
    _, ok_enc, ok_curve, ok_sub = _dev([off, outside])
    assert ok_enc.all()
    assert not ok_curve[0] and ok_curve[1]
    assert not ok_sub[1]
    with pytest.raises(oc.NotOnCurve):
        oc.g1_decompress(off)
    with pytest.raises(oc.NotInGroup):
        oc.g1_decompress(outside)


def test_sign_flag_both_roots():
    # compress G, then flip the sign bit: decompression must give -G
    comp = bytearray(oc.g1_compress(oc.G1_GEN))
    comp[0] ^= 0x20
    got, ok_enc, ok_curve, ok_sub = _dev([bytes(comp)])
    assert ok_enc.all() and ok_curve.all() and ok_sub.all()
    gen = oc.jac_to_affine(oc.FP_OPS, oc.G1_GEN)
    assert got[0][0] == gen[0] and got[0][1] == of.P - gen[1]


# ---------------------------------------------------------------------------
# G2 (96-byte) — setup-load symmetry with the reference's P2::decompress
# (reference src/bls.rs:554-570, setup.rs:68-72)
# ---------------------------------------------------------------------------

from kateth_tpu.curves import g2 as g2mod


def _dev2(comp_list):
    arr = jnp.asarray(
        np.frombuffer(b"".join(comp_list), dtype=np.uint8).reshape(len(comp_list), 96)
    )
    pt, ok_enc, ok_curve, ok_sub = decompress.g2_decompress(arr)
    return (
        g2mod.to_oracle(pt),
        np.asarray(ok_enc),
        np.asarray(ok_curve),
        np.asarray(ok_sub),
    )


def test_g2_valid_points_roundtrip():
    pts = [oc.g2_mul(oc.G2_GEN, k) for k in (1, 2, 7, 0xDEADBEEF, of.R - 1)]
    comp = [oc.g2_compress(p) for p in pts]
    got, ok_enc, ok_curve, ok_sub = _dev2(comp)
    assert ok_enc.all() and ok_curve.all() and ok_sub.all()
    for g, p in zip(got, pts):
        want = oc.jac_to_affine(oc.FP2_OPS, p)
        assert (g[0], g[1]) == want


def test_g2_infinity_and_sign():
    inf = bytes([0xC0] + [0] * 95)
    comp = bytearray(oc.g2_compress(oc.G2_GEN))
    comp[0] ^= 0x20  # sign flip -> -G2
    got, ok_enc, ok_curve, ok_sub = _dev2([inf, bytes(comp)])
    assert ok_enc.all() and ok_curve.all() and ok_sub.all()
    assert oc.jac_is_infinity(oc.FP2_OPS, got[0])
    gen = oc.jac_to_affine(oc.FP2_OPS, oc.G2_GEN)
    assert got[1][0] == gen[0]
    from kateth_tpu.oracle.field import fp2_neg
    assert got[1][1] == fp2_neg(gen[1])


def test_g2_error_masks():
    # x >= p in the c1 slot
    bad = bytearray(oc.g2_compress(oc.G2_GEN))
    bad[0:48] = (of.P + 1).to_bytes(48, "big")
    bad[0] |= 0x80
    # top bit clear
    bad2 = bytearray(oc.g2_compress(oc.G2_GEN))
    bad2[0] &= 0x7F
    _, ok_enc, ok_curve, _ = _dev2([bytes(bad), bytes(bad2)])
    assert not ok_enc[0] and not ok_enc[1]
