"""AdvancedSHE: many-operand helpers, rotation ladders, polynomial and
Chebyshev series evaluation.

Reference analog: /root/reference src/pke/lib/schemebase/base-advancedshe.cpp
(EvalAddMany/EvalMultMany binary trees, EvalLinearWSum, EvalSum via rotation
ladders, EvalInnerProduct, EvalMerge) and
src/pke/lib/scheme/ckksrns/ckksrns-advancedshe.cpp (EvalPolyLinear/PS,
EvalChebyshevSeries{Linear,PS}, EvalChebyshevFunction, EvalSin/Cos/
Logistic/Divide) + ckksrns-utils.cpp (LongDivisionChebyshev).

The Paterson-Stockmeyer variants exploit the pointwise identity
f(x) = q(x) * T_g(x) + r(x) from Chebyshev-basis long division, so the
homomorphic evaluation is: eval(q) * ct_{T_g} + eval(r), recursively.
"""

from __future__ import annotations

import math

import numpy as np

from openfhe_tpu.math.chebyshev import (eval_chebyshev_coefficients,
                                        long_division_chebyshev)
from openfhe_tpu.pke.ciphertext import Ciphertext


# ---------------------------------------------------------------------------
# many-operand trees (base-advancedshe.cpp)
# ---------------------------------------------------------------------------

def eval_add_many(cc, cts) -> Ciphertext:
    cts = list(cts)
    while len(cts) > 1:
        nxt = [cc.EvalAdd(cts[i], cts[i + 1])
               for i in range(0, len(cts) - 1, 2)]
        if len(cts) % 2:
            nxt.append(cts[-1])
        cts = nxt
    return cts[0]


def eval_mult_many(cc, cts) -> Ciphertext:
    cts = list(cts)
    while len(cts) > 1:
        nxt = [cc.EvalMult(cts[i], cts[i + 1])
               for i in range(0, len(cts) - 1, 2)]
        if len(cts) % 2:
            nxt.append(cts[-1])
        cts = nxt
    return cts[0]


def eval_linear_wsum(cc, cts, weights) -> Ciphertext:
    """sum_i w_i * ct_i (weights plaintext scalars)."""
    acc = cc.EvalMult(cts[0], weights[0])
    for ct, w in zip(cts[1:], weights[1:]):
        acc = cc.EvalAdd(acc, cc.EvalMult(ct, w))
    return acc


# ---------------------------------------------------------------------------
# rotation ladders (EvalSum & friends)
# ---------------------------------------------------------------------------

def eval_sum_keygen(cc, sk, batch_size: int | None = None) -> None:
    batch = batch_size or cc.slots
    rots = [1 << j for j in range(int(math.log2(batch)))]
    cc.EvalRotateKeyGen(sk, rots)


def eval_sum(cc, ct: Ciphertext, batch_size: int | None = None) -> Ciphertext:
    """Sum over `batch_size` slots into every slot (log2 rotations)."""
    batch = batch_size or ct.slots
    out = ct
    j = 1
    while j < batch:
        out = cc.EvalAdd(out, cc.EvalRotate(out, j))
        j <<= 1
    return out


def eval_sum_rows_keygen(cc, sk, row_size: int, batch: int) -> None:
    rots = []
    j = row_size
    while j < batch:
        rots.append(j)
        j <<= 1
    cc.EvalRotateKeyGen(sk, rots)


def eval_sum_rows(cc, ct: Ciphertext, row_size: int,
                  batch: int | None = None) -> Ciphertext:
    """Sum matrix rows (slots viewed as [batch/row_size, row_size])."""
    batch = batch or ct.slots
    out = ct
    j = row_size
    while j < batch:
        out = cc.EvalAdd(out, cc.EvalRotate(out, j))
        j <<= 1
    return out


def eval_sum_cols_keygen(cc, sk, row_size: int) -> None:
    rots = [1 << j for j in range(int(math.log2(row_size)))]
    cc.EvalRotateKeyGen(sk, rots)


def eval_sum_cols(cc, ct: Ciphertext, row_size: int) -> Ciphertext:
    out = ct
    j = 1
    while j < row_size:
        out = cc.EvalAdd(out, cc.EvalRotate(out, j))
        j <<= 1
    return out


def eval_inner_product(cc, ct1: Ciphertext, ct2: Ciphertext,
                       batch_size: int | None = None) -> Ciphertext:
    return eval_sum(cc, cc.EvalMult(ct1, ct2), batch_size)


def eval_merge(cc, cts) -> Ciphertext:
    """Merge slot 0 of each ct_i into slot i of one ciphertext
    (reference: EvalMerge, base-advancedshe.cpp)."""
    slots = cts[0].slots
    mask0 = np.zeros(slots)
    mask0[0] = 1.0
    acc = None
    for i, ct in enumerate(cts):
        masked = cc.EvalMult(ct, mask0)
        if i:
            masked = cc.EvalRotate(masked, -i)
        acc = masked if acc is None else cc.EvalAdd(acc, masked)
    return acc


# ---------------------------------------------------------------------------
# polynomial evaluation (power basis)
# ---------------------------------------------------------------------------

def _powers(cc, ct: Ciphertext, n: int) -> dict:
    """ct^1..ct^n with log-depth binary decomposition."""
    pows = {1: ct}
    for j in range(2, n + 1):
        half = j // 2
        if j % 2 == 0:
            pows[j] = cc.EvalSquare(pows[half])
        else:
            pows[j] = cc.EvalMult(pows[half + 1], pows[half])
    return pows


def _as_scalars(coeffs) -> list:
    out = []
    for c in coeffs:
        c = complex(c)
        out.append(c.real if c.imag == 0.0 else c)
    return out


def eval_powers(cc, ct: Ciphertext, coefficients) -> dict:
    """Power basis ct^1..ct^deg sized by the coefficient vector
    (reference EvalPowers, cryptocontext.h:2716); reusable across several
    EvalPolyWithPrecomp calls."""
    return _powers(cc, ct, max(1, len(coefficients) - 1))


def eval_poly_with_precomp(cc, pows: dict, coeffs) -> Ciphertext:
    """(reference EvalPolyWithPrecomp, cryptocontext.h:2739)"""
    coeffs = _as_scalars(coeffs)
    acc = None
    for j in range(1, len(coeffs)):
        if coeffs[j] == 0.0:
            continue
        term = cc.EvalMult(pows[j], coeffs[j])
        acc = term if acc is None else cc.EvalAdd(acc, term)
    if acc is None:
        acc = cc.EvalMult(pows[1], 0.0)
    if coeffs[0] != 0.0:
        acc = cc.EvalAdd(acc, coeffs[0])
    return acc


def eval_poly_linear(cc, ct: Ciphertext, coeffs) -> Ciphertext:
    """f(ct) = sum_j coeffs[j] * ct^j (reference: EvalPolyLinear);
    real or complex coefficients."""
    coeffs = _as_scalars(coeffs)
    pows = _powers(cc, ct, len(coeffs) - 1)
    return eval_poly_with_precomp(cc, pows, coeffs)


def eval_poly(cc, ct: Ciphertext, coeffs) -> Ciphertext:
    """Dispatch like the reference EvalPoly (PS for high degree)."""
    if len(coeffs) - 1 > 8:
        # power basis -> Chebyshev on [-1,1] would change semantics; the
        # reference's EvalPolyPS works in the power basis. We reuse the
        # binary-decomposition powers, which is already log-depth.
        return eval_poly_linear(cc, ct, coeffs)
    return eval_poly_linear(cc, ct, coeffs)


# ---------------------------------------------------------------------------
# Chebyshev series evaluation
# ---------------------------------------------------------------------------

def _cheb_basis(cc, y: Ciphertext, upto: int) -> dict:
    """T_1..T_upto of y with log-depth: T_{a+b} = 2 T_a T_b - T_{|a-b|}."""
    t = {1: y}
    for j in range(2, upto + 1):
        a = j // 2
        b = j - a
        prod = cc.EvalMult(t[a], t[b])
        two = cc.EvalAdd(prod, prod)
        d = abs(a - b)
        if d == 0:
            t[j] = cc.EvalSub(two, 1.0)
        else:
            t[j] = cc.EvalSub(two, t[d])
    return t


def eval_cheby_polys(cc, ct: Ciphertext, coefficients, a: float,
                     b: float) -> dict:
    """Chebyshev basis T_1..T_deg of the affinely-mapped input (reference
    EvalChebyPolys, cryptocontext.h:2793); reusable across several series
    (EvalChebyshevSeriesWithPrecomp)."""
    n = max(1, len(coefficients) - 1)
    if (a, b) != (-1.0, 1.0):
        scale = 2.0 / (b - a)
        shift = -(2.0 * a / (b - a) + 1.0)
        y = cc.EvalAdd(cc.EvalMult(ct, scale), shift)
        if cc._auto() and y.noise_deg == 2:
            y = cc.ModReduce(y)
    else:
        y = ct
    return _cheb_basis(cc, y, n)


def eval_chebyshev_series_with_precomp(cc, basis: dict,
                                       coefficients) -> Ciphertext:
    """(reference EvalChebyshevSeriesWithPrecomp, cryptocontext.h:2820)
    sum c_k T_k from a precomputed basis; c_0 halved per the reference
    convention."""
    coeffs = [complex(c) for c in coefficients]
    n = len(coeffs) - 1
    acc = cc.EvalMult(basis[1], coeffs[1] if n >= 1 else 0.0)
    for j in range(2, n + 1):
        if coeffs[j] == 0:
            continue
        acc = cc.EvalAdd(acc, cc.EvalMult(basis[j], coeffs[j]))
    return cc.EvalAdd(acc, coeffs[0] / 2.0)


def eval_chebyshev_series_linear(cc, ct: Ciphertext, coefficients,
                                 a: float, b: float) -> Ciphertext:
    """sum c_k T_k(y), y = 2(x-a)/(b-a) - 1, c_0 halved (reference
    convention, ckksrns-advancedshe.cpp EvalChebyshevSeriesLinear)."""
    coeffs = [complex(c) for c in coefficients]   # complex series support
    n = len(coeffs) - 1
    # affine map into [-1, 1]
    if (a, b) != (-1.0, 1.0):
        scale = 2.0 / (b - a)
        shift = -(2.0 * a / (b - a) + 1.0)
        y = cc.EvalAdd(cc.EvalMult(ct, scale), shift)
        if cc._auto() and y.noise_deg == 2:
            y = cc.ModReduce(y)
    else:
        y = ct
    t = _cheb_basis(cc, y, max(1, n))
    acc = cc.EvalMult(t[1], coeffs[1] if n >= 1 else 0.0)
    # (complex coefficients ride the CKKS packed encoding natively)
    for j in range(2, n + 1):
        if coeffs[j] == 0:
            continue
        acc = cc.EvalAdd(acc, cc.EvalMult(t[j], coeffs[j]))
    acc = cc.EvalAdd(acc, coeffs[0] / 2.0)
    return acc


def eval_chebyshev_series_ps(cc, ct: Ciphertext, coefficients,
                             a: float, b: float) -> Ciphertext:
    """Paterson-Stockmeyer evaluation via Chebyshev long division
    (reference: EvalChebyshevSeriesPS)."""
    coeffs = [complex(c) for c in coefficients]   # complex series support
    coeffs[0] /= 2.0           # fold the reference's c0/2 convention
    n = len(coeffs) - 1
    if n <= 4:
        c2 = list(coefficients)
        return eval_chebyshev_series_linear(cc, ct, c2, a, b)
    if (a, b) != (-1.0, 1.0):
        scale = 2.0 / (b - a)
        shift = -(2.0 * a / (b - a) + 1.0)
        y = cc.EvalAdd(cc.EvalMult(ct, scale), shift)
        if cc._auto() and y.noise_deg == 2:
            y = cc.ModReduce(y)
    else:
        y = ct
    k = max(2, 1 << int(math.ceil(math.log2(math.sqrt(n + 1)))))
    babies = _cheb_basis(cc, y, k)
    giants = {}  # degree -> ct of T_degree
    g = k
    while g <= n:
        if g == k:
            giants[g] = babies[k]
        else:
            prod = cc.EvalSquare(giants[g // 2])
            giants[g] = cc.EvalSub(cc.EvalAdd(prod, prod), 1.0)
        g <<= 1

    def eval_series(f):
        """Recursive PS evaluation of Chebyshev coeff list f (c0 already
        absorbed, i.e. value = sum f_j T_j with T_0 = 1)."""
        deg = len(f) - 1
        while deg > 0 and abs(f[deg]) < 1e-300:
            deg -= 1
        f = f[:deg + 1]
        if deg <= k:
            acc = None
            for j in range(1, deg + 1):
                if f[j] == 0:
                    continue
                term = cc.EvalMult(babies[j], f[j])
                acc = term if acc is None else cc.EvalAdd(acc, term)
            if acc is None:
                return cc.EvalMult(babies[1], 0.0) if f[0] == 0 else \
                    cc.EvalAdd(cc.EvalMult(babies[1], 0.0), f[0])
            return cc.EvalAdd(acc, f[0]) if f[0] != 0 else acc
        # largest precomputed giant <= deg
        g = max(d for d in giants if d <= deg)
        tg = [0.0] * (g + 1)
        tg[g] = 1.0
        q, r = long_division_chebyshev(f, tg)
        q_ct = eval_series(q)
        r_ct = eval_series(r)
        return cc.EvalAdd(cc.EvalMult(q_ct, giants[g]), r_ct)

    return eval_series(coeffs)


def eval_chebyshev_series(cc, ct, coefficients, a, b) -> Ciphertext:
    if len(coefficients) - 1 > 8:
        return eval_chebyshev_series_ps(cc, ct, coefficients, a, b)
    return eval_chebyshev_series_linear(cc, ct, coefficients, a, b)


def eval_chebyshev_function(cc, func, ct, a, b, degree) -> Ciphertext:
    """(reference: EvalChebyshevFunction) interpolate then evaluate."""
    coeffs = eval_chebyshev_coefficients(func, a, b, degree)
    return eval_chebyshev_series(cc, ct, coeffs, a, b)


def eval_sin(cc, ct, a, b, degree):
    return eval_chebyshev_function(cc, math.sin, ct, a, b, degree)


def eval_cos(cc, ct, a, b, degree):
    return eval_chebyshev_function(cc, math.cos, ct, a, b, degree)


def eval_logistic(cc, ct, a, b, degree):
    return eval_chebyshev_function(cc, lambda x: 1.0 / (1.0 + math.exp(-x)),
                                   ct, a, b, degree)


def eval_divide(cc, ct, a, b, degree):
    return eval_chebyshev_function(cc, lambda x: 1.0 / x, ct, a, b, degree)
