"""TPU-native big-integer modular arithmetic on u32 digit planes.

Design (see SURVEY.md §7 "core representation decision"):

* A field element is a little-endian vector of ``D`` radix-``2^16`` digits
  stored in a ``uint32`` array of shape ``(..., D)`` — Fr has D=16,
  Fp has D=24.  All arithmetic stays inside native u32 vector lanes:
  16x16-bit digit products fit u32 exactly, and delayed-carry column
  accumulation keeps every intermediate below 2^23, so no 64-bit types are
  ever needed (TPUs have no native u64).

* Elements are kept in Montgomery form (R = 2^(16 D) mod N) exactly like
  the reference's blst backend keeps blst_fr/blst_fp (reference:
  src/bls.rs:80-106), converting only at the byte-codec boundary.

* Every function is shape-polymorphic over leading batch dimensions and
  jit/vmap/shard_map friendly: no data-dependent control flow, fixed-shape
  unrolled digit loops (D is a small static constant).

The same machinery instantiates both fields (and, by composition, the
Fp2/Fp6/Fp12 tower): replacing the reference's entire blst Fr/Fp symbol
surface (bls.rs:8-19) with XLA-fusable vector code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import os

import numpy as np
import jax
import jax.numpy as jnp

DIGIT_BITS = 16
DIGIT_MASK = (1 << DIGIT_BITS) - 1

#: kill switch for the Pallas fast path (debugging / A-B measurement)
_NO_PALLAS = os.environ.get("KATETH_NO_PALLAS", "") == "1"


def int_to_digits(v: int, n_digits: int) -> np.ndarray:
    """Python int -> little-endian radix-2^16 digit vector (host side)."""
    out = np.zeros((n_digits,), dtype=np.uint32)
    for i in range(n_digits):
        out[i] = (v >> (DIGIT_BITS * i)) & DIGIT_MASK
    assert v >> (DIGIT_BITS * n_digits) == 0, "value does not fit"
    return out


def digits_to_int(d) -> int:
    """Digit vector (1-D) -> Python int (host side, for tests/debug)."""
    d = np.asarray(d, dtype=np.uint64)
    return sum(int(x) << (DIGIT_BITS * i) for i, x in enumerate(d))


@dataclass(frozen=True, eq=False)  # eq=False: identity hash, so specs can
# be jit static arguments despite ndarray fields
class FieldSpec:
    """Static description of a prime field in digit-plane representation."""

    name: str
    modulus: int
    n_digits: int
    # derived numpy constants (filled in __post_init__)
    mod_digits: np.ndarray = field(init=False, repr=False)
    r_mod_n: int = field(init=False, repr=False)
    r2: int = field(init=False, repr=False)
    n0inv: int = field(init=False, repr=False)
    one_mont: np.ndarray = field(init=False, repr=False)
    r2_digits: np.ndarray = field(init=False, repr=False)
    nprime_digits: np.ndarray = field(init=False, repr=False)
    zero: np.ndarray = field(init=False, repr=False)

    def __post_init__(self):
        N, D = self.modulus, self.n_digits
        assert N % 2 == 1
        R = 1 << (DIGIT_BITS * D)
        assert N < R
        object.__setattr__(self, "mod_digits", int_to_digits(N, D))
        object.__setattr__(self, "r_mod_n", R % N)
        object.__setattr__(self, "r2", R * R % N)
        object.__setattr__(self, "n0inv", (-pow(N, -1, 1 << DIGIT_BITS)) % (1 << DIGIT_BITS))
        object.__setattr__(self, "one_mont", int_to_digits(R % N, D))
        object.__setattr__(self, "r2_digits", int_to_digits(R * R % N, D))
        # N' = -N^-1 mod R for non-interleaved Montgomery reduction
        object.__setattr__(self, "nprime_digits", int_to_digits((-pow(N, -1, R)) % R, D))
        object.__setattr__(self, "zero", np.zeros((D,), dtype=np.uint32))

    # -- host-side codecs (tests / setup loading) ---------------------------

    def from_int(self, v: int, mont: bool = True) -> np.ndarray:
        v %= self.modulus
        if mont:
            v = v * (1 << (DIGIT_BITS * self.n_digits)) % self.modulus
        return int_to_digits(v, self.n_digits)

    def to_int(self, d, mont: bool = True) -> int:
        v = digits_to_int(d)
        if mont:
            v = v * pow(1 << (DIGIT_BITS * self.n_digits), -1, self.modulus) % self.modulus
        return v % self.modulus


# ---------------------------------------------------------------------------
# carry / borrow machinery
# ---------------------------------------------------------------------------

def _shift_up(x: jax.Array, k: int) -> jax.Array:
    """Shift digits one/k positions toward the most significant end."""
    pad = jnp.zeros((*x.shape[:-1], k), dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def _ks_carries(g: jax.Array, p: jax.Array) -> jax.Array:
    """Kogge-Stone parallel-prefix carries.

    g_i: position i generates a carry; p_i: position i propagates.
    Returns c, where c_i = carry INTO position i.  Log-depth, fully
    vectorized — no sequential per-digit chain for XLA to choke on.
    """
    D = g.shape[-1]
    k = 1
    while k < D:
        g = g | (p & _shift_up(g, k))
        p = p & _shift_up(p, k)
        k *= 2
    return _shift_up(g, 1)


def carry_pass(t: jax.Array) -> jax.Array:
    """Full carry propagation; result digits < 2^16.

    Input digits may be up to ~2^23 (delayed-carry columns); the final
    carry out of the top digit is DROPPED (callers must ensure it is zero).
    Two soft-carry rounds reduce digits to <= 2^16, after which carries are
    binary and a Kogge-Stone prefix resolves them in log depth.
    """
    t = soft_carry(t, rounds=2)  # digits <= 2^16
    g = (t >> DIGIT_BITS).astype(jnp.bool_)  # digit == 2^16
    p = (t & DIGIT_MASK) == DIGIT_MASK
    c = _ks_carries(g, p).astype(jnp.uint32)
    return (t + c) & DIGIT_MASK


def _geq(a: jax.Array, n_digits: np.ndarray) -> jax.Array:
    """a >= N (both canonical digit vectors); returns bool (...,)."""
    n = jnp.asarray(n_digits, dtype=jnp.uint32)
    # lexicographic compare from most significant digit
    gt = a[..., -1] > n[..., -1]
    eq = a[..., -1] == n[..., -1]
    for i in range(a.shape[-1] - 2, -1, -1):
        gt = gt | (eq & (a[..., i] > n[i]))
        eq = eq & (a[..., i] == n[i])
    return gt | eq


def _sub_digits(a: jax.Array, b: jax.Array):
    """(a - b) mod 2^(16D) with borrow-out; Kogge-Stone, no digit chain.

    Computed as a + ~b + 1 (two's complement); borrow = NOT carry-out.
    """
    D = a.shape[-1]
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    comp = jnp.uint32(DIGIT_MASK) - b
    ulp = jnp.concatenate(
        [jnp.ones((*shape[:-1], 1), jnp.uint32), jnp.zeros((*shape[:-1], D - 1), jnp.uint32)],
        axis=-1,
    )
    s = a + comp + ulp  # digits < 2^17
    zcol = jnp.zeros((*shape[:-1], 1), jnp.uint32)
    s_ext = jnp.concatenate([s, zcol], axis=-1)
    g = (s_ext >> DIGIT_BITS).astype(jnp.bool_)
    p = (s_ext & DIGIT_MASK) == DIGIT_MASK
    c = _ks_carries(g, p).astype(jnp.uint32)
    diff = ((s_ext + c) & DIGIT_MASK)[..., :D]
    carry_out = c[..., D] | (s_ext[..., D] >> DIGIT_BITS)
    borrow = jnp.uint32(1) - carry_out
    return diff, borrow


def cond_sub_mod(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """If a >= N subtract N (a must be < 2N and canonical-digit)."""
    n = jnp.asarray(spec.mod_digits, dtype=jnp.uint32)
    diff, borrow = _sub_digits(a, jnp.broadcast_to(n, a.shape))
    take_diff = borrow == 0  # no underflow => a >= N
    return jnp.where(take_diff[..., None], diff, a)


# ---------------------------------------------------------------------------
# field ops (Montgomery domain unless stated otherwise)
# ---------------------------------------------------------------------------

def add(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """(a + b) mod N; replaces blst_fr_add / blst_fp_add."""
    s = carry_pass(a + b)
    return cond_sub_mod(spec, s)


def sub(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """(a - b) mod N; replaces blst_fr_sub."""
    diff, borrow = _sub_digits(a, b)
    n = jnp.asarray(spec.mod_digits, dtype=jnp.uint32)
    fixed = carry_pass(diff + n)
    return jnp.where((borrow == 1)[..., None], fixed, diff)


def neg(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """(-a) mod N; replaces blst_fr_cneg(flag=true)."""
    n = jnp.asarray(spec.mod_digits, dtype=jnp.uint32)
    diff, _ = _sub_digits(jnp.broadcast_to(n, a.shape), a)
    # -0 must stay 0
    return jnp.where(is_zero(a)[..., None], a, diff)


def is_zero(a: jax.Array) -> jax.Array:
    return jnp.all(a == 0, axis=-1)


def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(a == b, axis=-1)


def lt_modulus(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Canonicality check a < N (replaces blst_scalar_fr_check)."""
    return ~_geq(a, spec.mod_digits)


def _skew_sum(rows: jax.Array, out_cols: int, lead: int, batch) -> jax.Array:
    """sum_i shift(rows[..., i, :], i + lead) without scatter/gather/chains.

    Pad each row to width out_cols+1 and flatten: element (i, j) sits at
    flat index (out_cols+1)*i + j + lead.  Re-reading the flat buffer with
    width out_cols puts it at column (i + j + lead) mod out_cols — the
    diagonal target (no wraparound: i + j + lead < out_cols by the
    caller's contract) — with colliding diagonals in distinct rows, so a
    single row-sum produces the convolution columns.
    """
    nrows, db = rows.shape[-2], rows.shape[-1]
    z = jnp.zeros((*batch, nrows, out_cols + 1 - db), dtype=rows.dtype)
    flat = jnp.concatenate([rows, z], axis=-1).reshape(*batch, nrows * (out_cols + 1))
    if lead:
        flat = jnp.concatenate(
            [jnp.zeros((*batch, lead), dtype=rows.dtype), flat], axis=-1
        )
    total = flat.shape[-1]
    n_out = -(-total // out_cols)
    pad = n_out * out_cols - total
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((*batch, pad), dtype=rows.dtype)], axis=-1
        )
    return jnp.sum(flat.reshape(*batch, n_out, out_cols), axis=-2)


def _conv_digits(a: jax.Array, b: jax.Array, out_cols: int) -> jax.Array:
    """Digit-plane convolution columns: sum_{i+j=c} a_i*b_j split in 16-bit
    halves.  Inputs must have digits <= 2^16 (products then fit u32); output
    columns are delayed-carry sums < 2*min(Da,Db)*2^16 <= 2^22.

    Backend split, and the reasons are hard-won (see also CLAUDE.md):

    * TPU: row-grouped skew-reshape — materialize (.., group, db) product
      slabs and place diagonals via the pad-flatten-reshape trick, then
      combine everything with ONE stacked jnp.sum.  This is the only
      formulation found to be correct on XLA:TPU inside scans: every
      iterative-accumulation variant (.at[].add chains, +jnp.pad chains,
      scan with roll or dynamic_slice) silently MISCOMPILES when fused
      into larger graphs (wrong digits, value-dependent, each op correct
      in isolation), and gathers inside lax.scan bodies kernel-fault the
      worker outright.  Row grouping caps the materialization at
      ~group*(out_cols+1)*4 bytes per lane so MSM-scale lane counts fit
      in HBM.

    * CPU: one lax.scan over a's digits with a rolled accumulator — the
      graph is ~15 ops regardless of digit count (XLA:CPU compile time is
      the binding constraint) and runs 3-6x faster than the alternatives.
    """
    da, db = a.shape[-1], b.shape[-1]
    assert out_cols >= da + db, (da, db, out_cols)
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, (*shape, da))
    b = jnp.broadcast_to(b, (*shape, db))

    if jax.default_backend() != "cpu":
        # Row-group size trades HLO count against materialized bytes:
        # each group materializes lanes*group*(out_cols+1)*4 bytes, and
        # each emits a fixed handful of ops.  The deep scan bodies
        # (scalar ladders, pairing, sqrt chains) run on tiny tensors and
        # are op-LAUNCH bound — full-width grouping quarters their op
        # count — while MSM-scale lane counts must stay capped at 6 to
        # fit HBM.  Shapes are static, so this is a trace-time decision.
        lanes = 1
        for s in shape:
            lanes *= int(s)
        group = da if lanes * da * (out_cols + 1) * 4 <= (256 << 20) else 6
        partials = []
        for g in range(0, da, group):
            rows = a[..., g : g + group, None] * b[..., None, :]  # (.., g, db)
            partials.append(_skew_sum(rows & DIGIT_MASK, out_cols, g, shape))
            partials.append(_skew_sum(rows >> DIGIT_BITS, out_cols, g + 1, shape))
        return jnp.sum(jnp.stack(partials, axis=-2), axis=-2)

    zeros_tail = jnp.zeros((*shape, out_cols - db - 1), jnp.uint32)
    zcol = jnp.zeros((*shape, 1), jnp.uint32)

    def step(acc, xs):
        ai, i = xs
        prod = ai[..., None] * b  # (..., db)
        lo = prod & DIGIT_MASK
        hi = prod >> DIGIT_BITS
        v = jnp.concatenate([lo, zcol], -1) + jnp.concatenate([zcol, hi], -1)
        buf = jnp.concatenate([v, zeros_tail], -1)  # (..., out_cols)
        return acc + jnp.roll(buf, i, axis=-1), None

    a_scan = jnp.moveaxis(a, -1, 0)  # (da, ...)
    # derive the init from BOTH operands so it inherits the device-varying
    # axis tag under shard_map whenever either input is sharded (a plain
    # zeros literal trips the scan carry-type check in sharded programs)
    zero_like = (a[..., :1] & jnp.uint32(0)) + (b[..., :1] & jnp.uint32(0))
    init = jnp.broadcast_to(zero_like, (*shape, out_cols))
    out, _ = jax.lax.scan(step, init, (a_scan, jnp.arange(da, dtype=jnp.int32)))
    return out


def soft_carry(t: jax.Array, rounds: int = 2) -> jax.Array:
    """Non-propagating carry rounds (vectorized, no sequential chain).

    Each round moves every digit's overflow one column up; two rounds take
    delayed columns < 2^22 down to digits <= 2^16 (note: 2^16, not 2^16-1,
    which is still safe for u32 products against canonical digits).
    Preserves the integer value (top carry must be provably zero).
    """
    for _ in range(rounds):
        carry = t >> DIGIT_BITS
        shifted = jnp.concatenate(
            [jnp.zeros((*t.shape[:-1], 1), dtype=jnp.uint32), carry[..., :-1]], axis=-1
        )
        t = (t & DIGIT_MASK) + shifted
    return t


def mont_reduce(spec: FieldSpec, t_soft: jax.Array) -> jax.Array:
    """Non-interleaved Montgomery reduction: t (..., 2D soft digits) -> (..., D).

    M = (t mod R) * N' mod R  (N' = -N^-1 mod R), then (t + M*N)/R, both as
    vectorized digit convolutions.  Replaces the sequential word-by-word
    REDC: only the final canonicalizing carry pass is sequential.
    """
    D = spec.n_digits
    nprime = jnp.asarray(spec.nprime_digits, dtype=jnp.uint32)
    n = jnp.asarray(spec.mod_digits, dtype=jnp.uint32)
    # full-width conv then truncate (the skew trick needs out_cols >= da+db)
    m = soft_carry(_conv_digits(t_soft[..., :D], nprime, 2 * D)[..., :D])
    u = _conv_digits(m, n, 2 * D)
    total = u + t_soft  # columns < 2^22 + 2^16
    res = carry_pass(total)[..., D:]
    return cond_sub_mod(spec, res)


def mont_mul(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product abR^-1 mod N; replaces blst_fr_mul / blst_fp_mul.

    Large batches on TPU take the Pallas kernel (whole REDC pipeline in
    VMEM — the XLA conv path materializes HBM slabs and runs ~100x off
    the bandwidth roofline at evaluate/MSM scale); small batches and CPU
    keep the XLA digit-plane path (kernel launch + relayout overhead
    dominates tiny tensors, and scan-body fusion matters more there).
    """
    if jax.default_backend() != "cpu" and not _NO_PALLAS:
        from . import pallas_mont  # lazy: keeps CPU-only paths pallas-free

        shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        lanes = 1
        for s in shape:
            lanes *= int(s)
        if lanes >= pallas_mont.MIN_LANES:
            return pallas_mont.mont_mul(spec, a, b)
    cols = _conv_digits(a, b, 2 * spec.n_digits)
    return mont_reduce(spec, soft_carry(cols))


def mont_sqr(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Standard -> Montgomery form (multiply by R^2)."""
    r2 = jnp.asarray(spec.r2_digits, dtype=jnp.uint32)
    return mont_mul(spec, a, jnp.broadcast_to(r2, a.shape))


def from_mont(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Montgomery -> standard form (REDC with zero high half)."""
    D = spec.n_digits
    cols = jnp.concatenate(
        [a, jnp.zeros((*a.shape[:-1], D), dtype=jnp.uint32)], axis=-1
    )
    return mont_reduce(spec, cols)


def mul_small(spec: FieldSpec, a: jax.Array, k) -> jax.Array:
    """a * k for small plain-int constant(s) k (< 2^7); stays in Montgomery
    form.  Used for curve-formula constants (e.g. 3b = 12).

    k may be a python int or an integer array broadcastable against a's
    batch dims (different constants per stacked row — the conditional
    subtraction loop is value-driven, so mixed constants share it).

    Works on a temporarily widened (D+1)-digit vector because k*N can
    exceed 2^(16 D) (Fr has only one spare bit above the modulus).
    """
    if isinstance(k, int):
        assert 0 < k < 128
        kmax = k
        karr = jnp.uint32(k)
    else:
        karr = np.asarray(k, dtype=np.uint32)
        kmax = int(karr.max())
        assert 0 < kmax < 128
        karr = jnp.asarray(karr)[..., None]  # broadcast over the digit axis
    D = spec.n_digits
    wide = jnp.concatenate([a, jnp.zeros((*a.shape[:-1], 1), dtype=jnp.uint32)], axis=-1)
    t = carry_pass(wide * karr)  # k*a < k*N < 2^(16(D+1))
    # binary reduction: conditionally subtract N*2^j from high j to low
    for j in range(kmax.bit_length() - 1, -1, -1):
        nj = jnp.asarray(int_to_digits(spec.modulus << j, D + 1), dtype=jnp.uint32)
        diff, borrow = _sub_digits(t, jnp.broadcast_to(nj, t.shape))
        t = jnp.where((borrow == 0)[..., None], diff, t)
    return t[..., :D]


def pow_const(spec: FieldSpec, a: jax.Array, e: int) -> jax.Array:
    """a^e for a static Python-int exponent (Montgomery domain in, out).

    Left-to-right square-and-multiply over the fixed bit pattern of e,
    expressed as a lax.scan so the graph stays small for 255+-bit
    exponents.  Replaces Fr::pow (bls.rs:169-187) for constant exponents.
    """
    assert e >= 0
    if e == 0:
        one = jnp.asarray(spec.one_mont, dtype=jnp.uint32)
        return jnp.broadcast_to(one, a.shape)
    if e >= 3 and (
        (jax.default_backend() != "cpu" and not _NO_PALLAS)
        or os.environ.get("KATETH_PALLAS_INTERPRET") == "1"
    ):
        # whole-chain kernel: one launch for the full square-and-multiply
        # ladder (the 381-step sqrt/Fermat chains are pure op-launch
        # latency as XLA scans)
        from . import pallas_mont

        return pallas_mont.pow_const(spec, a, e)
    bits = np.array([int(c) for c in bin(e)[2:]], dtype=np.bool_)

    def step(acc, bit):
        acc = mont_sqr(spec, acc)
        acc_mul = mont_mul(spec, acc, a)
        return jnp.where(bit, acc_mul, acc), None

    init = jnp.where(bits[0], a, jnp.broadcast_to(jnp.asarray(spec.one_mont, dtype=jnp.uint32), a.shape))
    if len(bits) == 1:
        return init
    out, _ = jax.lax.scan(step, init, jnp.asarray(bits[1:]))
    return out


def inv(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """a^-1 via Fermat (a^(N-2)); zero maps to zero.  Montgomery domain."""
    return pow_const(spec, a, spec.modulus - 2)


def batch_inv(spec: FieldSpec, a: jax.Array, axis: int = -2) -> jax.Array:
    """Montgomery's batched-inversion trick along `axis`: one Fermat chain
    for the whole batch plus 3 multiplies per element (replaces the
    per-term blst_fr_eucl_inverse loop, reference poly.rs:23-28).

    Zeros are passed through as zeros (masked: they contribute ONE to the
    running products).
    """
    axis = axis % a.ndim  # associative_scan(reverse=...) needs nonneg axis
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont, dtype=jnp.uint32), a.shape)
    zero_mask = is_zero(a)[..., None]
    safe = jnp.where(zero_mask, one, a)

    mul = partial(mont_mul, spec)
    # inclusive prefix products along axis
    prefix = jax.lax.associative_scan(mul, safe, axis=axis)
    total = jnp.take(prefix, jnp.array([safe.shape[axis] - 1]), axis=axis)
    total_inv = inv(spec, total)
    # suffix products: scan reversed
    suffix = jax.lax.associative_scan(mul, safe, reverse=True, axis=axis)
    # inv_i = prefix_{i-1} * suffix_{i+1} * total_inv
    D = a.shape[-1]
    ones_row = jnp.broadcast_to(
        jnp.asarray(spec.one_mont, dtype=jnp.uint32),
        jnp.take(prefix, jnp.array([0]), axis=axis).shape,
    )
    prefix_shift = jnp.concatenate(
        [ones_row, jax.lax.slice_in_dim(prefix, 0, a.shape[axis] - 1, axis=axis)], axis=axis
    )
    suffix_shift = jnp.concatenate(
        [jax.lax.slice_in_dim(suffix, 1, a.shape[axis], axis=axis), ones_row], axis=axis
    )
    out = mul(mul(prefix_shift, suffix_shift), total_inv)
    return jnp.where(zero_mask, jnp.zeros_like(a), out)


def sum_mod(spec: FieldSpec, x: jax.Array, axis: int = -2) -> jax.Array:
    """Modular sum along `axis` via log-depth pairwise folding.

    Length along `axis` must be a power of two (pad with zeros upstream).
    """
    n = x.shape[axis]
    assert n & (n - 1) == 0 and n > 0
    ax = axis % x.ndim
    while n > 1:
        lo = jax.lax.slice_in_dim(x, 0, n // 2, axis=ax)
        hi = jax.lax.slice_in_dim(x, n // 2, n, axis=ax)
        x = add(spec, lo, hi)
        n //= 2
    return jnp.squeeze(x, axis=ax)


# ---------------------------------------------------------------------------
# byte codecs (device side)
# ---------------------------------------------------------------------------

def be_bytes_to_digits(spec: FieldSpec, b: jax.Array) -> jax.Array:
    """(..., 2D) big-endian u8 bytes -> (..., D) digit planes (plain form,
    NOT reduced / NOT validated; see lt_modulus for canonicality)."""
    D = spec.n_digits
    b = b.astype(jnp.uint32)
    pairs = b.reshape(*b.shape[:-1], D, 2)  # big-endian 16-bit words
    words = (pairs[..., 0] << 8) | pairs[..., 1]
    return words[..., ::-1]  # little-endian digit order


def digits_to_be_bytes(spec: FieldSpec, d: jax.Array) -> jax.Array:
    """(..., D) digit planes (plain form) -> (..., 2D) big-endian u8."""
    words = d[..., ::-1]
    hi = (words >> 8) & 0xFF
    lo = words & 0xFF
    return jnp.stack([hi, lo], axis=-1).reshape(*words.shape[:-1], -1).astype(jnp.uint8)
