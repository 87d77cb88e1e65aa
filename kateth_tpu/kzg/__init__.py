"""EIP-4844 KZG public API (TPU-native).

Re-exports mirror the reference crate root (reference src/lib.rs:5-7,
src/kzg/mod.rs:9-35).
"""

from .config import KzgConfig, MAINNET
from .setup import DeviceSetup
from .api import (
    Kzg,
    BYTES_PER_COMMITMENT,
    BYTES_PER_FIELD_ELEMENT,
    BYTES_PER_PROOF,
)
from ..oracle.kzg import KzgError

__all__ = [
    "Kzg",
    "KzgConfig",
    "KzgError",
    "DeviceSetup",
    "MAINNET",
    "BYTES_PER_COMMITMENT",
    "BYTES_PER_FIELD_ELEMENT",
    "BYTES_PER_PROOF",
]
