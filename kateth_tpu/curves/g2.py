"""G2 on device: complete-formula ops over Fp2 digit planes."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields import fp2
from ..fields.specs import FP
from ..oracle import curve as oc
from . import ops

F = ops.FP2_FIELD


def identity(shape=()):
    return ops.identity(F, shape)


def add(p, q):
    return ops.padd(F, p, q)


def double(p):
    return ops.pdouble(F, p)


def neg(p):
    return ops.pneg(F, p)


def scalar_mul(p, scalar_digits):
    return ops.scalar_mul(F, p, scalar_digits)


def eq(p, q):
    return ops.peq(F, p, q)


def to_affine(p):
    return ops.to_affine(F, p)


# --- host bridges ----------------------------------------------------------

def from_oracle(points):
    xs, ys, zs = [], [], []
    for pt in points:
        aff = oc.g2_to_affine(pt)
        if aff is None:
            xs.append(fp2.from_ints(0, 0))
            ys.append(fp2.from_ints(1, 0))
            zs.append(fp2.from_ints(0, 0))
        else:
            xs.append(fp2.from_ints(*aff[0]))
            ys.append(fp2.from_ints(*aff[1]))
            zs.append(fp2.from_ints(1, 0))
    return (
        np.stack(xs).astype(np.uint32),
        np.stack(ys).astype(np.uint32),
        np.stack(zs).astype(np.uint32),
    )


def to_oracle(p):
    X = np.asarray(p[0]).reshape(-1, 2, FP.n_digits)
    Y = np.asarray(p[1]).reshape(-1, 2, FP.n_digits)
    Z = np.asarray(p[2]).reshape(-1, 2, FP.n_digits)
    out = []
    for i in range(X.shape[0]):
        z = fp2.to_ints(Z[i])
        if z == (0, 0):
            out.append(oc.g2_infinity())
            continue
        from ..oracle.field import fp2_inv, fp2_mul

        zi = fp2_inv(z)
        x = fp2_mul(fp2.to_ints(X[i]), zi)
        y = fp2_mul(fp2.to_ints(Y[i]), zi)
        out.append((x, y, (1, 0)))
    return out


GENERATOR = tuple(jnp.asarray(a[0]) for a in from_oracle([oc.G2_GEN]))
