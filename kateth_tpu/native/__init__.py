"""Native host-side components (C++, ctypes-loaded).

`sha256_many` / `challenges` replace the reference's blst_sha256 surface
(reference src/bls.rs:194) for the Fiat-Shamir hot path.  The shared
library is built on first import with the system compiler and cached; if
no compiler is available everything falls back to hashlib transparently.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sha256.cc")
_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "kateth_tpu")

_lib = None
_tried = False


def _build() -> str | None:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so = os.path.join(_CACHE_DIR, "libkateth_native.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", so, _SRC],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return so
        except (FileNotFoundError, subprocess.CalledProcessError, subprocess.TimeoutExpired):
            continue
    return None


def _get_lib():
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        so = _build()
        if so is not None:
            try:
                lib = ctypes.CDLL(so)
                lib.kateth_sha256.argtypes = [
                    ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
                ]
                lib.kateth_sha256_batch.argtypes = [
                    ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
                    ctypes.c_size_t, ctypes.c_char_p,
                ]
                lib.kateth_challenges.argtypes = [
                    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t,
                    ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
                ]
                _lib = lib
            except OSError:
                _lib = None
    return _lib


def sha256(data: bytes) -> bytes:
    lib = _get_lib()
    if lib is None:
        return hashlib.sha256(data).digest()
    out = ctypes.create_string_buffer(32)
    lib.kateth_sha256(data, len(data), out)
    return out.raw


def challenges(domain_and_degree: bytes, blobs: bytes, blob_len: int,
               commitments: bytes, n: int) -> list[bytes]:
    """Batched Fiat-Shamir challenge digests (reference blob.rs:78-97).

    Dispatch note: the bulk of the work is long-message SHA-256, where
    OpenSSL's SHA-NI path (behind hashlib) beats portable C by ~10x on
    this hardware — so hashlib is the default and the native library is
    opt-in (KATETH_NATIVE_SHA=1) for hosts without accelerated OpenSSL.
    """
    # real errors, not asserts: these guard the C hasher's buffer reads and
    # must survive `python -O`
    if len(domain_and_degree) != 32:
        raise ValueError("domain_and_degree must be 32 bytes")
    if len(blobs) != n * blob_len or len(commitments) != n * 48:
        raise ValueError("blobs/commitments buffer length mismatch")
    lib = _get_lib() if os.environ.get("KATETH_NATIVE_SHA") == "1" else None
    if lib is None:
        return [
            hashlib.sha256(
                domain_and_degree
                + blobs[i * blob_len : (i + 1) * blob_len]
                + commitments[i * 48 : (i + 1) * 48]
            ).digest()
            for i in range(n)
        ]
    out = ctypes.create_string_buffer(32 * n)
    lib.kateth_challenges(domain_and_degree, blobs, blob_len, commitments, n, out)
    return [out.raw[32 * i : 32 * (i + 1)] for i in range(n)]
