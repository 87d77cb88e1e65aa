"""G1 on device: thin instantiation of the generic complete-formula ops,
plus host<->device conversions bridging to the oracle representation."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.specs import FP, FR
from ..oracle import curve as oc
from . import ops

F = ops.FP_FIELD


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


def select(mask, p, q):
    return ops.pselect(F, mask, p, q)


def to_affine(p):
    return ops.to_affine(F, p)


# --- host bridges (oracle Jacobian ints <-> device digit planes) -----------

def from_oracle(points) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """List of oracle Jacobian points -> batched projective digit planes."""
    xs, ys, zs = [], [], []
    for pt in points:
        aff = oc.g1_to_affine(pt)
        if aff is None:
            xs.append(FP.from_int(0))
            ys.append(FP.from_int(1))
            zs.append(FP.from_int(0))
        else:
            xs.append(FP.from_int(aff[0]))
            ys.append(FP.from_int(aff[1]))
            zs.append(FP.from_int(1))
    return (
        np.stack(xs).astype(np.uint32),
        np.stack(ys).astype(np.uint32),
        np.stack(zs).astype(np.uint32),
    )


def to_oracle(p):
    """Device point (single or batched) -> list of oracle Jacobian points."""
    X = np.asarray(p[0]).reshape(-1, FP.n_digits)
    Y = np.asarray(p[1]).reshape(-1, FP.n_digits)
    Z = np.asarray(p[2]).reshape(-1, FP.n_digits)
    out = []
    for i in range(X.shape[0]):
        z = FP.to_int(Z[i])
        if z == 0:
            out.append(oc.g1_infinity())
            continue
        x = FP.to_int(X[i])
        y = FP.to_int(Y[i])
        zi = pow(z, -1, FP.modulus)
        out.append((x * zi % FP.modulus, y * zi % FP.modulus, 1))
    return out


GENERATOR = tuple(jnp.asarray(a[0]) for a in from_oracle([oc.G1_GEN]))
