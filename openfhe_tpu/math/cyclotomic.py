"""Arbitrary-cyclotomic transforms via Bluestein's chirp-z FFT.

Reference parity: BluesteinFFTNat / ChineseRemainderTransformArbNat
(/root/reference src/core/include/math/hal/intnat/transformnat.h:379-560,
transformnat-impl.h) — the CRT transform for rings Z_q[x]/Phi_m(x) with
arbitrary (non-power-of-two) cyclotomic order m.  This is a research /
cold path in the reference (the RNS schemes all use power-of-two rings,
served by ops/ntt.py); here it is a host-side exact-integer utility.

Design (not a translation):
  * Forward transform = evaluate a (deg < totient(m)) at the primitive
    m-th roots of unity omega^i, i in U(m) — Bluestein chirp-z of length
    m: X_k = beta^{-k^2} * sum_j (a_j beta^{-j^2}) beta^{(j+k)^2} with
    beta a primitive 2m-th root mod q, i.e. one cyclic convolution of
    power-of-two length M >= 2m.
  * The convolution is computed EXACTLY over the integers by CRT over
    30-bit NTT-friendly primes (enough primes to bound M * (q-1)^2),
    each residue convolved with the shared host NTT kernel
    (native.host_ntt fast path / packed-encoding numpy fallback), then
    Garner-recombined with Python ints.  This replaces the reference's
    single oversized "bigModulus" NTT (transformnat.h:529-556) — CRT
    limbs keep every multiply in 64-bit, the same trick the RNS schemes
    use on-device.
  * Inverse transform: zero-fill the non-unit slots, full m-point inverse
    chirp-z, then reduce mod Phi_m(x).  Correctness: the length-m inverse
    b agrees with a at every root of Phi_m, so Phi_m | (b - a).
"""

from __future__ import annotations

import functools
import math

import numpy as np

from openfhe_tpu.math import nbtheory as nb


# ---------------------------------------------------------------------------
# Cyclotomic polynomial (host, exact): Phi_m(x) over Z, reduced mod q.
# Reference: GetCyclotomicPolynomial (src/core/lib/math/nbtheory.cpp).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def cyclotomic_poly(m: int) -> tuple:
    """Integer coefficients of Phi_m(x), low-to-high, via
    x^m - 1 = prod_{d | m} Phi_d(x) and exact polynomial division."""
    if m == 1:
        return (-1, 1)
    # numerator x^m - 1
    num = [0] * (m + 1)
    num[0], num[m] = -1, 1
    # divide by Phi_d for all proper divisors d
    for d in range(1, m):
        if m % d == 0:
            den = cyclotomic_poly(d)
            num = _polydiv_exact(num, list(den))
    return tuple(num)


def _polydiv_exact(num: list, den: list) -> list:
    """Exact division of integer polynomials (remainder must be 0)."""
    num = list(num)
    out = [0] * (len(num) - len(den) + 1)
    for i in range(len(out) - 1, -1, -1):
        c = num[i + len(den) - 1] // den[-1]
        out[i] = c
        if c:
            for j, dj in enumerate(den):
                num[i + j] -= c * dj
    assert not any(num[:len(den) - 1]), "non-exact cyclotomic division"
    return out


# ---------------------------------------------------------------------------
# Exact cyclic convolution of u64 sequences via 30-bit CRT NTT limbs.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _conv_primes(big_len: int, bound_bits: int) -> tuple:
    """NTT-friendly (p = 1 mod 2*big_len) 30-bit primes whose product
    exceeds 2^bound_bits."""
    primes, total = [], 0
    p = nb.first_prime(30, 2 * big_len)
    while total < bound_bits + 1:
        primes.append(p)
        total += p.bit_length() - 1
        p = nb.next_prime(p, 2 * big_len)
    return tuple(primes)


def _cyclic_conv_exact(a: np.ndarray, b: np.ndarray, big_len: int,
                       bound_bits: int) -> list:
    """Exact integer cyclic convolution of length big_len (power of two).

    a, b: object arrays of nonneg Python ints < 2^~60; values of the
    result must be < 2^bound_bits.  Returns list of Python ints."""
    from openfhe_tpu.pke.encoding import packed as pk

    primes = _conv_primes(big_len, bound_bits)
    residues = []
    for p in primes:
        pa = np.array([int(x) % p for x in a], np.uint64)
        pb = np.array([int(x) % p for x in b], np.uint64)
        # cyclic (not negacyclic) convolution: use the order-big_len NTT
        # = negacyclic tables of psi^2; _host_ntt family is negacyclic,
        # so fold the chirp: cyclic conv via numpy NTT with omega of
        # order big_len.
        fa = _cyclic_ntt(pa, p, big_len, False)
        fb = _cyclic_ntt(pb, p, big_len, False)
        residues.append(_cyclic_ntt((fa * fb) % np.uint64(p), p, big_len,
                                    True))
    # Garner recombination
    out = []
    for i in range(big_len):
        x, mod = 0, 1
        for p, r in zip(primes, residues):
            t = ((int(r[i]) - x) * nb.mod_inverse(mod % p, p)) % p
            x += mod * t
            mod *= p
        out.append(x)
    return out


@functools.lru_cache(maxsize=None)
def _cyclic_tables(p: int, n: int) -> tuple:
    """Twiddle tables that make the shared butterfly network compute the
    CYCLIC length-n NTT: the network is a residue tree (split x^{2t} - c^2
    into x^t -/+ c); for x^n - 1 the node constant at level m, position i
    is w^{(n/(2m)) * brev_{log2 m}(i)} with w of order n."""
    w = nb.root_of_unity(n, p)
    iw = nb.mod_inverse(w, p)
    psi = [1] * n
    ipsi = [1] * n
    m = 1
    while m < n:
        stride = n // (2 * m)
        logm = m.bit_length() - 1
        for i in range(m):
            e = stride * (nb.bit_reverse(i, logm) if logm else 0)
            psi[m + i] = pow(w, e, p)
            ipsi[m + i] = pow(iw, e, p)
        m *= 2
    return (np.array(psi, np.uint64), np.array(ipsi, np.uint64),
            nb.mod_inverse(n, p))


def _cyclic_ntt(x: np.ndarray, p: int, n: int, inverse: bool) -> np.ndarray:
    """Length-n cyclic NTT mod p (n power of two, p = 1 mod n): the same
    butterfly network as the negacyclic kernel but with order-n twiddles
    (no psi pre/post twist)."""
    from openfhe_tpu import native
    psi_br, ipsi_br, ninv = _cyclic_tables(p, n)
    fast = native.host_ntt(x, p, psi_br, ipsi_br, ninv, inverse)
    if fast is not None:
        return fast
    # numpy fallback — identical stage structure to packed._host_ntt
    a = x.astype(object)
    if not inverse:
        step, m = n, 1
        while m < n:
            step //= 2
            for i in range(m):
                s = int(psi_br[m + i])
                j1 = 2 * i * step
                for j in range(j1, j1 + step):
                    u, v = int(a[j]), int(a[j + step]) * s % p
                    a[j], a[j + step] = (u + v) % p, (u - v) % p
            m *= 2
    else:
        step, m = 1, n // 2
        while m >= 1:
            for i in range(m):
                s = int(ipsi_br[m + i])
                j1 = 2 * i * step
                for j in range(j1, j1 + step):
                    u, v = int(a[j]), int(a[j + step])
                    a[j] = (u + v) % p
                    a[j + step] = (u - v) * s % p
            m //= 2
            step *= 2
        ninv_i = int(ninv)
        for j in range(n):
            a[j] = a[j] * ninv_i % p
    return np.array([int(v) for v in a], np.uint64)


# ---------------------------------------------------------------------------
# Bluestein chirp-z DFT of arbitrary length m mod q.
# ---------------------------------------------------------------------------

def bluestein_fft(x, q: int, root: int, inverse: bool = False) -> list:
    """Length-m DFT mod q at the m-th root `root` (Bluestein chirp-z,
    reference BluesteinFFTNat::ForwardTransform transformnat.h:414-446).

    x: m integers mod q.  Requires a primitive 2m-th root of `root`,
    i.e. q = 1 mod 2m for odd-order use; we derive beta with beta^2 =
    root by root-of-unity search.  Exact for any q (CRT convolution)."""
    m = len(x)
    w = nb.mod_inverse(root, q) if inverse else root
    beta = _beta_for(q, m, w)
    big = 1 << (2 * m - 1).bit_length()
    # w^{jk} = beta^{j^2 + k^2 - (k-j)^2}:
    #   X_k = beta^{k^2} * sum_j (x_j beta^{j^2}) * ibeta^{(k-j)^2}
    # — a length-`big` cyclic convolution.
    ibeta = nb.mod_inverse(beta, q)
    u = [0] * big
    for j in range(m):
        u[j] = int(x[j]) % q * pow(beta, j * j, q) % q
    v = [0] * big
    for t in range(-(m - 1), m):
        v[t % big] = pow(ibeta, t * t, q)
    bound = (2 * m * (q - 1) * (q - 1)).bit_length()
    conv = _cyclic_conv_exact(np.array(u, object), np.array(v, object),
                              big, bound)
    out = [conv[k] % q * pow(beta, k * k, q) % q for k in range(m)]
    if inverse:
        minv = nb.mod_inverse(m, q)
        out = [val * minv % q for val in out]
    return out


@functools.lru_cache(maxsize=None)
def _beta_for(q: int, m: int, w: int) -> int:
    """A 2m-th root beta mod q with beta^2 = w (w an m-th root)."""
    if (q - 1) % (2 * m) != 0:
        raise ValueError(f"q={q} must be 1 mod 2m for Bluestein (m={m})")
    beta = nb.root_of_unity(2 * m, q)
    # beta^2 is SOME primitive m-th root; find e odd with beta^{2e} = w
    for e in range(1, 2 * m, 2):
        if math.gcd(e, 2 * m) == 1 and pow(beta, 2 * e, q) == w:
            return pow(beta, e, q)
    # w may be non-primitive (inverse of power) — fall back to sqrt search
    for e in range(2 * m):
        if pow(beta, 2 * e, q) == w:
            return pow(beta, e, q)
    raise ValueError("no square root of the DFT root found")


# ---------------------------------------------------------------------------
# CRT transform for Z_q[x]/Phi_m(x)  (ChineseRemainderTransformArbNat)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _units(m: int) -> tuple:
    return tuple(i for i in range(m) if math.gcd(i, m) == 1)


def forward_transform_arb(coeffs, q: int, m: int) -> list:
    """COEFF -> EVAL for arbitrary cyclotomic order m: values a(omega^i)
    for i in U(m), omega a primitive m-th root mod q (reference
    ChineseRemainderTransformArbNat::ForwardTransform)."""
    t = nb.totient(m)
    a = list(coeffs) + [0] * (m - len(coeffs))
    if len(coeffs) > t:
        raise ValueError("input degree must be < totient(m)")
    omega = nb.root_of_unity(m, q)
    full = bluestein_fft(a, q, omega)
    return [full[i] for i in _units(m)]


def inverse_transform_arb(values, q: int, m: int) -> list:
    """EVAL -> COEFF: zero-extend to all m slots, inverse chirp-z, then
    reduce mod Phi_m(x) (reference InverseTransform + Drop)."""
    units = _units(m)
    t = len(units)
    if len(values) != t:
        raise ValueError("need totient(m) evaluation values")
    full = [0] * m
    for i, u in enumerate(units):
        full[u] = int(values[i]) % q
    omega = nb.root_of_unity(m, q)
    b = bluestein_fft(full, q, omega, inverse=True)
    # reduce mod Phi_m over Z_q
    phi = [c % q for c in cyclotomic_poly(m)]
    inv_lead = nb.mod_inverse(phi[-1], q)   # Phi_m is monic: == 1
    for i in range(m - 1, t - 1, -1):
        c = b[i] * inv_lead % q
        if c:
            for j in range(len(phi)):
                b[i - (len(phi) - 1) + j] = (
                    b[i - (len(phi) - 1) + j] - c * phi[j]) % q
    return [v % q for v in b[:t]]


def multiply_arb(a, b, q: int, m: int) -> list:
    """Multiplication in Z_q[x]/Phi_m(x) through the CRT transform —
    the end-to-end use the reference exercises in UnitTestTransform."""
    fa = forward_transform_arb(a, q, m)
    fb = forward_transform_arb(b, q, m)
    return inverse_transform_arb([x * y % q for x, y in zip(fa, fb)], q, m)
