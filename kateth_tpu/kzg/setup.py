"""Trusted-setup loading and device residency.

Mirrors the reference's Setup::load_json (src/kzg/setup.rs:46-82): parse
JSON hex, decompress all points with on-curve + subgroup checks, apply the
bit-reversal permutation to the G1 Lagrange points and the roots of unity,
keep [tau]_2 for the pairing check.

TPU-native differences:
* Decompression (one-time, sqrt-heavy) runs on the host via the oracle; the
  result is cached as an .npz of digit planes so subsequent loads are
  instant (the reference re-decompresses all 4161 points every startup).
* Tables live as device arrays in Montgomery form: projective G1 planes
  (N, 24) x 3, the single [tau]_2 point, roots and inverse roots (N, 16).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.specs import FP, FR
from ..fields import limbs as L
from ..curves import g1 as g1mod, g2 as g2mod
from .config import KzgConfig, MAINNET

DEFAULT_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "kateth_tpu")

#: vendored mainnet trusted setup (the public KZG ceremony output, same
#: file the reference ships at its repo root), overridable via env var
DEFAULT_TRUSTED_SETUP = os.environ.get(
    "KATETH_TRUSTED_SETUP",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "data",
        "trusted_setup_4096.json",
    ),
)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DeviceSetup:
    """Device-resident trusted setup (pytree; config is static aux data)."""

    g1x: jax.Array  # (N, 24) u32, Montgomery
    g1y: jax.Array
    g1z: jax.Array
    tau2x: jax.Array  # (2, 24) [tau]_2 projective
    tau2y: jax.Array
    tau2z: jax.Array
    roots: jax.Array  # (N, 16) Montgomery Fr, BRP order
    inv_roots: jax.Array  # (N, 16) Montgomery Fr, BRP order
    config: KzgConfig = MAINNET

    def tree_flatten(self):
        children = (
            self.g1x, self.g1y, self.g1z,
            self.tau2x, self.tau2y, self.tau2z,
            self.roots, self.inv_roots,
        )
        return children, self.config

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, config=aux)

    @property
    def g1_points(self):
        return (self.g1x, self.g1y, self.g1z)

    @property
    def tau2(self):
        return (self.tau2x, self.tau2y, self.tau2z)

    # -- construction ---------------------------------------------------

    @classmethod
    def from_oracle(cls, osetup, config: KzgConfig | None = None) -> "DeviceSetup":
        """Build device arrays from a validated OracleSetup."""
        from ..oracle.field import R

        config = config or KzgConfig(n=osetup.n, g2_len=len(osetup.g2_monomial))
        assert osetup.n == config.n
        g1x, g1y, g1z = g1mod.from_oracle(osetup.g1_lagrange_brp)
        t2x, t2y, t2z = g2mod.from_oracle([osetup.g2_monomial[1]])
        roots = np.stack([FR.from_int(r) for r in osetup.roots_brp])
        inv_roots = np.stack(
            [FR.from_int(pow(r, R - 2, R)) for r in osetup.roots_brp]
        )
        return cls(
            g1x=jnp.asarray(g1x), g1y=jnp.asarray(g1y), g1z=jnp.asarray(g1z),
            tau2x=jnp.asarray(t2x[0]), tau2y=jnp.asarray(t2y[0]), tau2z=jnp.asarray(t2z[0]),
            roots=jnp.asarray(roots), inv_roots=jnp.asarray(inv_roots),
            config=config,
        )

    @classmethod
    def load_json(
        cls,
        path: str,
        config: KzgConfig = MAINNET,
        cache_dir: str | None = DEFAULT_CACHE_DIR,
    ) -> "DeviceSetup":
        """Parse + validate a trusted-setup JSON (reference setup.rs:46-82),
        with an .npz fast path keyed on the file contents."""
        with open(path, "rb") as f:
            raw = f.read()
        key = hashlib.sha256(raw).hexdigest()[:16]
        cache = None
        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)
            cache = os.path.join(cache_dir, f"setup_{key}_{config.n}.npz")
            if os.path.exists(cache):
                z = np.load(cache)
                return cls(
                    g1x=jnp.asarray(z["g1x"]), g1y=jnp.asarray(z["g1y"]),
                    g1z=jnp.asarray(z["g1z"]),
                    tau2x=jnp.asarray(z["tau2x"]), tau2y=jnp.asarray(z["tau2y"]),
                    tau2z=jnp.asarray(z["tau2z"]),
                    roots=jnp.asarray(z["roots"]), inv_roots=jnp.asarray(z["inv_roots"]),
                    config=config,
                )
        from ..oracle.kzg import OracleSetup

        osetup = OracleSetup.load_json(path, n=config.n, g2_len=config.g2_len)
        out = cls.from_oracle(osetup, config)
        if cache is not None:
            np.savez_compressed(
                cache,
                g1x=np.asarray(out.g1x), g1y=np.asarray(out.g1y), g1z=np.asarray(out.g1z),
                tau2x=np.asarray(out.tau2x), tau2y=np.asarray(out.tau2y),
                tau2z=np.asarray(out.tau2z),
                roots=np.asarray(out.roots), inv_roots=np.asarray(out.inv_roots),
            )
        return out
