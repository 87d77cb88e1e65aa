"""Oracle curve-layer tests: generators, group law, serialization."""

import random

import pytest

from kateth_tpu.oracle import curve as c
from kateth_tpu.oracle import field as f

rng = random.Random(0xC0DE)

# well-known compressed generator encodings (Zcash format)
G1_GEN_COMPRESSED = bytes.fromhex(
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb"
)
G2_GEN_COMPRESSED = bytes.fromhex(
    "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049334cf11213945d57e5ac7d055d042b7e"
    "024aa2b2f08f0a91260805272dc51051c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
)


def test_generators_on_curve():
    assert c.jac_on_curve(c.FP_OPS, c.G1_GEN)
    assert c.jac_on_curve(c.FP2_OPS, c.G2_GEN)


def test_generators_in_subgroup():
    assert c.g1_in_subgroup(c.G1_GEN)
    assert c.g2_in_subgroup(c.G2_GEN)


def test_g1_group_law():
    p = c.g1_mul(c.G1_GEN, rng.randrange(f.R))
    q = c.g1_mul(c.G1_GEN, rng.randrange(f.R))
    assert c.g1_eq(c.g1_add(p, q), c.g1_add(q, p))
    assert c.g1_eq(c.g1_add(p, c.g1_neg(p)), c.g1_infinity())
    assert c.g1_eq(c.g1_add(p, c.g1_infinity()), p)
    assert c.g1_eq(c.g1_double(p), c.g1_add(p, p))
    a, b = rng.randrange(f.R), rng.randrange(f.R)
    assert c.g1_eq(
        c.g1_add(c.g1_mul(p, a), c.g1_mul(p, b)),
        c.g1_mul(p, (a + b) % f.R),
    )


def test_g1_order():
    p = c.g1_mul(c.G1_GEN, 12345)
    assert c.g1_is_infinity(c.g1_mul(p, f.R))


def test_g2_group_law():
    p = c.g2_mul(c.G2_GEN, rng.randrange(f.R))
    q = c.g2_mul(c.G2_GEN, rng.randrange(f.R))
    assert c.g2_eq(c.g2_add(p, q), c.g2_add(q, p))
    assert c.g2_eq(c.g2_add(p, c.g2_neg(p)), c.g2_infinity())
    assert c.g2_is_infinity(c.g2_mul(p, f.R))


def test_g1_compress_generator():
    assert c.g1_compress(c.G1_GEN) == G1_GEN_COMPRESSED
    assert c.g1_eq(c.g1_decompress(G1_GEN_COMPRESSED), c.G1_GEN)


def test_g2_compress_generator():
    assert c.g2_compress(c.G2_GEN) == G2_GEN_COMPRESSED
    assert c.g2_eq(c.g2_decompress(G2_GEN_COMPRESSED), c.G2_GEN)


def test_g1_compress_roundtrip():
    for _ in range(8):
        p = c.g1_mul(c.G1_GEN, rng.randrange(f.R))
        assert c.g1_eq(c.g1_decompress(c.g1_compress(p)), p)


def test_g2_compress_roundtrip():
    for _ in range(4):
        p = c.g2_mul(c.G2_GEN, rng.randrange(f.R))
        assert c.g2_eq(c.g2_decompress(c.g2_compress(p)), p)


def test_infinity_roundtrip():
    assert c.g1_compress(c.g1_infinity()) == bytes([0xC0] + [0] * 47)
    assert c.g1_is_infinity(c.g1_decompress(bytes([0xC0] + [0] * 47)))
    assert c.g2_is_infinity(c.g2_decompress(bytes([0xC0] + [0] * 95)))


def test_decompress_errors():
    # uncompressed bit clear
    with pytest.raises(c.BadEncoding):
        c.g1_decompress(bytes(48))
    # x >= p
    bad = bytearray(G1_GEN_COMPRESSED)
    bad[0] = 0x9F
    bad[1:] = b"\xff" * 47
    with pytest.raises(c.BadEncoding):
        c.g1_decompress(bytes(bad))
    # infinity with extra bits
    inf = bytearray([0xC0] + [0] * 47)
    inf[10] = 1
    with pytest.raises(c.BadEncoding):
        c.g1_decompress(bytes(inf))
    # not on curve: find an x with no sqrt
    x = 5
    while True:
        y2 = (x * x * x + 4) % f.P
        if f.fp_sqrt(y2) is None:
            break
        x += 1
    enc = bytearray(x.to_bytes(48, "big"))
    enc[0] |= 0x80
    with pytest.raises(c.NotOnCurve):
        c.g1_decompress(bytes(enc))
    # wrong length
    with pytest.raises(c.BadEncoding):
        c.g1_decompress(b"\x80" + bytes(40))


def test_not_in_subgroup_rejected():
    """A point on the curve but outside the r-order subgroup must error."""
    # cofactor h1 > 1, so a random curve point is almost surely not in G1.
    x = 1
    while True:
        y2 = (x * x * x + 4) % f.P
        y = f.fp_sqrt(y2)
        if y is not None:
            pt = (x, y, 1)
            if not c.g1_in_subgroup(pt):
                break
        x += 1
    enc = c.g1_compress(pt)
    with pytest.raises(c.NotInGroup):
        c.g1_decompress(enc)


def test_msm_matches_naive():
    pts = [c.g1_mul(c.G1_GEN, rng.randrange(f.R)) for _ in range(20)]
    scalars = [rng.randrange(f.R) for _ in range(20)]
    assert c.g1_eq(c.g1_msm(pts, scalars), c.g1_lincomb(pts, scalars))


def test_msm_empty_and_zero():
    assert c.g1_is_infinity(c.g1_msm([], []))
    pts = [c.G1_GEN]
    assert c.g1_is_infinity(c.g1_msm(pts, [0]))
