"""Device-side modular arithmetic on uint32 lanes.

TPU-native replacement for the reference's word-level modular integer layer
(`NativeIntegerT` Barrett/Shoup modmul, /root/reference
src/core/include/math/hal/intnat/ubintnat.h, mubintvecnat.h).

Design: TPU vector lanes have no 64-bit multiply-high, so every 32x32->64
product is decomposed into 16-bit half products (4 VPU multiplies). All
moduli are odd primes < 2^31, so sums of two canonical residues never wrap
uint32 and a single conditional subtract renormalizes.

Three multiply flavours, mirroring the reference's fast paths:
  * `mul_mod_shoup`  — variable x constant, with a precomputed Shoup
    companion (reference: `ModMulFastConst`, ubintnat.h). ~7 vector mults.
  * `mul_mod`        — variable x variable via full 64-bit product + fold
    of the high word through 2^32 mod q (reference: `ModMulFast`).
  * `mul_mod_barrett`— alias of mul_mod (kept for API parity).

All functions broadcast: residue tensors are typically [k, N] uint32 with
per-tower constants shaped [k, 1].
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
# plain Python int: weakly-typed literal keeps uint32 and, unlike a concrete
# jnp scalar, doesn't become a captured constant inside pallas kernels
_MASK16 = 0xFFFF


# ---------------------------------------------------------------------------
# host-side precomputation helpers (Python ints; exact)
# ---------------------------------------------------------------------------

def shoup(c: int, q: int) -> int:
    """Shoup companion floor(c * 2^32 / q) for constant-multiplier modmul."""
    if not 0 <= c < q:
        raise ValueError(f"shoup constant {c} out of range for q={q}")
    return (c << 32) // q


def mod_constants(q: int) -> tuple[int, int, int]:
    """Per-modulus constants (r32, r32_shoup, m32) used by `mul_mod`.

    r32 = 2^32 mod q, m32 = floor(2^32 / q).
    """
    r32 = (1 << 32) % q
    return r32, shoup(r32, q), (1 << 32) // q


# ---------------------------------------------------------------------------
# device-side primitives
# ---------------------------------------------------------------------------

def umul32_hilo(a, b):
    """Full 64-bit product of uint32 tensors as a (hi, lo) uint32 pair."""
    a = a.astype(U32)
    b = b.astype(U32)
    al = a & _MASK16
    ah = a >> 16
    bl = b & _MASK16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl                      # may wrap: max 2*(2^16-1)^2 > 2^32
    carry_mid = (mid < lh).astype(U32)
    lo = ll + (mid << 16)
    carry_lo = (lo < ll).astype(U32)
    hi = hh + (mid >> 16) + (carry_mid << 16) + carry_lo
    return hi, lo


def umulhi32(a, b):
    """High 32 bits of the 64-bit product of uint32 tensors."""
    return umul32_hilo(a, b)[0]


def add_mod(a, b, q):
    """(a + b) mod q for canonical residues a, b < q < 2^31."""
    t = a + b
    return jnp.where(t >= q, t - q, t)


def sub_mod(a, b, q):
    """(a - b) mod q for canonical residues."""
    t = a + q - b
    return jnp.where(t >= q, t - q, t)


def neg_mod(a, q):
    """(-a) mod q for canonical residues."""
    return jnp.where(a == 0, a, q - a)


def cond_sub(t, q):
    """Renormalize t in [0, 2q) to [0, q)."""
    return jnp.where(t >= q, t - q, t)


def mul_mod_shoup(x, c, c_shoup, q):
    """x * c mod q with precomputed c_shoup = floor(c * 2^32 / q).

    Valid for any x < 2^32 and c < q; result canonical. Reference analog:
    ubintnat.h `ModMulFastConst` (Shoup trick).
    """
    qhat = umulhi32(x, c_shoup)
    t = x * c - qhat * q               # computed mod 2^32; true value < 2q
    return jnp.where(t >= q, t - q, t)


def umulhi32_approx(a, b):
    """High 32 bits of a*b, possibly 1 TOO LOW (drops the low-word carry).

    Skips computing the full low word (saves one multiply and the carry
    compare), at the cost of quotient error <= 1 — callers must budget one
    extra conditional subtract.
    """
    a = a.astype(U32)
    b = b.astype(U32)
    al = a & _MASK16
    ah = a >> 16
    bl = b & _MASK16
    bh = b >> 16
    lh = al * bh
    hl = ah * bl
    mid = lh + hl
    carry_mid = (mid < lh).astype(U32)
    return ah * bh + (mid >> 16) + (carry_mid << 16)


def mul_mod_shoup_fast(x, c, c_shoup, q):
    """x * c mod q via an approximate Shoup quotient — REQUIRES q < 2^30.

    qhat may be 1 low, so t = x*c - qhat*q lands in [0, 3q); with q < 2^30
    that never wraps uint32, and two conditional subtracts canonicalize.
    Net ~2 VPU ops cheaper than `mul_mod_shoup`. Used by the kara-gated
    Pallas kernels (all moduli < 2^27 there).
    """
    qhat = umulhi32_approx(x, c_shoup)
    t = x * c - qhat * q
    t = jnp.where(t >= q, t - q, t)
    return jnp.where(t >= q, t - q, t)


def mul_mod_shoup_lazy3(x, c, c_shoup, q):
    """x * c mod q, LAZY: returns t in [0, 3q) — REQUIRES q < 2^30.

    `mul_mod_shoup_fast` without the two conditional subtracts; use when
    the consumer accumulates lazily (sums of k terms stay < 3k*q) or
    feeds an epilogue that accepts any uint32 (barrett_u32 /
    mul_mod_shoup*)."""
    qhat = umulhi32_approx(x, c_shoup)
    return x * c - qhat * q


def barrett_u32(lo, q, m32):
    """Reduce a full uint32 value lo (< 2^32) to [0, q); m32=floor(2^32/q)."""
    v = umulhi32(lo, m32)
    t = lo - v * q                     # < 2q + q  (one extra subtract needed)
    t = jnp.where(t >= q, t - q, t)
    return jnp.where(t >= q, t - q, t)


def mul_mod(a, b, q, r32, r32_shoup, m32):
    """a * b mod q for variable tensors a, b < q (odd q < 2^31).

    Strategy: (hi, lo) = a*b as 64-bit; result = hi*(2^32 mod q) + lo (mod q)
    where the first term uses the Shoup companion of the constant 2^32 mod q
    and lo is Barrett-reduced.
    """
    hi, lo = umul32_hilo(a, b)
    t1 = mul_mod_shoup(hi, r32, r32_shoup, q)
    t2 = barrett_u32(lo, q, m32)
    return add_mod(t1, t2, q)


def pow_mod(a, e: int, q, r32, r32_shoup, m32):
    """a ** e mod q for a static non-negative Python int exponent."""
    result = jnp.ones_like(a)
    base = a
    while e:
        if e & 1:
            result = mul_mod(result, base, q, r32, r32_shoup, m32)
        e >>= 1
        if e:
            base = mul_mod(base, base, q, r32, r32_shoup, m32)
    return result
