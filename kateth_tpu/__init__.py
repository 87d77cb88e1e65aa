"""kateth-tpu: a TPU-native Ethereum EIP-4844 KZG library.

A from-scratch JAX/XLA/Pallas implementation of the KZG polynomial
commitment API over BLS12-381 (same capabilities as the reference
`kateth` Rust crate, redesigned TPU-first).
"""

__version__ = "0.1.0"
