"""Trusted-setup loading and device residency.

Mirrors the reference's Setup::load_json (src/kzg/setup.rs:46-82): parse
JSON hex, decompress all points with on-curve + subgroup checks, apply the
bit-reversal permutation to the G1 Lagrange points and the roots of unity,
keep [tau]_2 for the pairing check.

TPU-native differences:
* Decompression of all 4161 setup points runs ON DEVICE as the batched
  G1/G2 decompression kernels (curves/decompress.py, `_load_json_device`
  below) with curve + subgroup checks folded in; the result is cached as
  an .npz of digit planes so subsequent loads are instant (the reference
  re-decompresses every startup).  The pure-host oracle path remains as
  the cross-check in tests/test_setup_relation.py.
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
#: file the reference ships at its repo root), packaged inside
#: kateth_tpu/data so installed wheels carry it; overridable via env var
DEFAULT_TRUSTED_SETUP = os.environ.get(
    "KATETH_TRUSTED_SETUP",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
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
    def _load_json_device(cls, raw: bytes, config: KzgConfig) -> "DeviceSetup":
        """Fully device-native load: batched G1 AND G2 decompression with
        on-curve + subgroup checks as device kernels (the blst-parity path,
        reference P1/P2::decompress at bls.rs:536-570 driven by
        setup.rs:60-72).  Replaces ~40 s of host-Python sqrt/subgroup
        arithmetic with two device programs."""
        import json

        from ..curves import decompress
        from ..oracle.field import R
        from ..oracle.kzg import KzgError

        obj = json.loads(raw)
        g1_hex, g2_hex = obj["g1_lagrange"], obj["g2_monomial"]
        if len(g1_hex) != config.n or len(g2_hex) != config.g2_len:
            raise KzgError("trusted setup has wrong point counts")

        def unhex(h):
            return bytes.fromhex(h[2:] if h.startswith("0x") else h)

        g1b = np.frombuffer(
            b"".join(unhex(h) for h in g1_hex), dtype=np.uint8
        ).reshape(config.n, 48)
        pt1, enc1, curve1, sub1 = jax.device_get(
            decompress.g1_decompress(jnp.asarray(g1b))
        )
        if not (enc1.all() and curve1.all() and sub1.all()):
            raise KzgError("invalid G1 point in trusted setup")
        g2b = np.frombuffer(
            b"".join(unhex(h) for h in g2_hex), dtype=np.uint8
        ).reshape(config.g2_len, 96)
        pt2, enc2, curve2, sub2 = jax.device_get(
            decompress.g2_decompress(jnp.asarray(g2b))
        )
        if not (enc2.all() and curve2.all() and sub2.all()):
            raise KzgError("invalid G2 point in trusted setup")

        # BRP the G1 table + roots (reference setup.rs:65,75 / math.rs:34-74)
        from ..ntt import _brp_indices

        brp = _brp_indices(config.n)
        w = pow(7, (R - 1) // config.n, R)
        roots_nat, cur = [], 1
        for _ in range(config.n):
            roots_nat.append(cur)
            cur = cur * w % R
        roots_brp = [roots_nat[i] for i in brp]
        roots = np.stack([FR.from_int(r) for r in roots_brp])
        inv_roots = np.stack([FR.from_int(pow(r, R - 2, R)) for r in roots_brp])
        return cls(
            g1x=jnp.asarray(np.asarray(pt1[0])[brp]),
            g1y=jnp.asarray(np.asarray(pt1[1])[brp]),
            g1z=jnp.asarray(np.asarray(pt1[2])[brp]),
            tau2x=jnp.asarray(pt2[0][1]), tau2y=jnp.asarray(pt2[1][1]),
            tau2z=jnp.asarray(pt2[2][1]),
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
        with an .npz fast path keyed on the file contents.

        On an accelerator backend the decompression/validation of all
        4096+65 points runs as device kernels (_load_json_device); on CPU
        the host oracle does it (device sqrt chains at 4096 lanes are
        compile-heavy on a CPU backend).  KATETH_SETUP_LOAD=device|oracle
        forces either path."""
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
        mode = os.environ.get("KATETH_SETUP_LOAD", "")
        use_device = mode == "device" or (
            mode != "oracle" and jax.default_backend() != "cpu"
        )
        out = None
        if use_device:
            from ..oracle.kzg import KzgError

            try:
                out = cls._load_json_device(raw, config)
            except KzgError as e:
                if mode == "device":
                    raise
                # A device-side rejection can be a TPU miscompile rather
                # than a bad setup (observed r5: the G2 decompress graph
                # rejects the valid mainnet setup on v5e while bit-exact
                # on CPU).  The host oracle is the validation authority:
                # recheck there — it raises KzgError itself on genuinely
                # invalid points, so bad setups still fail loudly.
                import sys

                print(
                    f"# kateth: device setup validation rejected ({e}); "
                    "rechecking on the host oracle",
                    file=sys.stderr,
                )
        if out is None:
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
