"""Lattice Gaussian sampling utilities (GPV / G-lattice / perturbation).

Reference analog: /root/reference src/core/include/lattice/
dgsampling{,-impl}.h (LatticeGaussSampUtility: GaussSampGq/GaussSampGqArbBase
:30-145, Perturb/PerturbFloat :146-185, SampleC :186-198, ZSampleSigma2x2
:199-230, SampleMat :231-357, ZSampleF :360-390, Permute/InversePermute).
Sources: https://eprint.iacr.org/2017/844 and 2018/946.

TPU-first redesign: the reference samples the n ring coefficients in an
OpenMP loop; here every per-coefficient loop is vectorized across
coefficients with numpy array centers (math/dgg.py sample_integers), so the
k-digit recurrences are the only sequential dimension.
"""

from __future__ import annotations

import math

import numpy as np

from openfhe_tpu.lattice.field2n import (COEFFICIENT, EVALUATION, Field2n)
from openfhe_tpu.math.dgg import sample_integers
from openfhe_tpu.math.matrix import Matrix

DG_ERROR = 8.27181e-25                       # 2^-80 (dgsampling.h:52)
N_MAX = 16384
SIGMA = math.sqrt(math.log(2 * N_MAX / DG_ERROR) / math.pi)
SPECTRAL_CONSTANT = 1.8


def spectral_bound(n: int, k: int, base: int) -> float:
    """(reference SPECTRAL_BOUND, dgsampling.h:63)"""
    return SPECTRAL_CONSTANT * (base + 1) * SIGMA * SIGMA * (
        math.sqrt(n * k) + math.sqrt(2 * n) + 4.7)


def spectral_bound_d(n: int, k: int, base: int, d: int) -> float:
    return SPECTRAL_CONSTANT * (base + 1) * SIGMA * SIGMA * (
        math.sqrt(d * n * k) + math.sqrt(2 * n) + 4.7)


def get_digits(v: np.ndarray, base: int, k: int) -> np.ndarray:
    """Base-`base` digits (LSD first) of each entry -> [k, ...]."""
    v = np.asarray(v, object)                 # object: q may exceed int64*b
    out = np.zeros((k,) + v.shape, np.int64)
    for i in range(k):
        out[i] = (v % base).astype(np.int64)
        v = v // base
    return out


# ---------------------------------------------------------------------------
# G-lattice sampling (digit decomposition of the syndrome)
# ---------------------------------------------------------------------------

def _gq_scaffold(modulus: int, base: int, k: int):
    m_digits = get_digits(np.array([modulus], object), base, k)[:, 0]
    l = np.zeros(k)
    h = np.zeros(k)
    l[0] = math.sqrt(base * (1 + 1 / k) + 1)
    for i in range(1, k):
        l[i] = math.sqrt(base * (1 + 1 / (k - i)))
    for i in range(1, k):
        h[i] = math.sqrt(base * (1 - 1 / (k - (i - 1))))
    c = np.zeros(k)
    c[0] = m_digits[0] / base
    for i in range(1, k):
        c[i] = (c[i - 1] + m_digits[i]) / base
    return m_digits, l, h, c


def _gq_combine(zc, m_digits, v_digits, base, k):
    z = np.zeros_like(zc)
    z[0] = base * zc[0] + m_digits[0] * zc[k - 1] + v_digits[0]
    for t in range(1, k - 1):
        z[t] = base * zc[t] - zc[t - 1] + m_digits[t] * zc[k - 1] \
            + v_digits[t]
    z[k - 1] = m_digits[k - 1] * zc[k - 1] - zc[k - 2] + v_digits[k - 1]
    return z


def _sample_c(c, sigma, a, rng):
    """(reference SampleC, dgsampling-impl.h) vectorized over coefficients;
    a is [k, n] and mutated per the reference."""
    k = len(c)
    zc = np.zeros_like(a, np.int64)
    zc[k - 1] = sample_integers(rng, -a[k - 1] / c[k - 1],
                                sigma / c[k - 1])
    a += zc[k - 1][None, :] * c[:, None]
    zc[:k - 1] = sample_integers(rng, -a[:k - 1], sigma)
    return zc


def gauss_samp_gq(u_coeffs: np.ndarray, stddev: float, k: int, modulus: int,
                  base: int, rng) -> np.ndarray:
    """(reference GaussSampGq) Sample z with G z = u mod q, G = I x g^T.

    u_coeffs: [n] syndrome coefficients in [0, q).  Returns [k, n] int64.
    Uses the integer Perturb path (exact nearest-plane on the gadget
    lattice).
    """
    sigma = stddev / (base + 1)
    m_digits, l, h, c = _gq_scaffold(modulus, base, k)
    n = len(u_coeffs)
    v_digits = get_digits(np.asarray(u_coeffs, object), base, k)  # [k, n]

    # Perturb (vectorized over the n coefficients; sequential in digits)
    zp = np.zeros((k, n), np.int64)
    d = np.zeros(n)
    for i in range(k):
        zp[i] = sample_integers(rng, d / l[i], sigma / l[i])
        d = -zp[i] * h[i]
    p = np.zeros((k, n), np.int64)
    p[0] = (2 * base + 1) * zp[0] + base * zp[1]
    for i in range(1, k - 1):
        p[i] = base * (zp[i - 1] + 2 * zp[i] + zp[i + 1])
    p[k - 1] = base * (zp[k - 2] + 2 * zp[k - 1])

    a = np.zeros((k, n))
    a[0] = (v_digits[0] - p[0]) / base
    for t in range(1, k):
        a[t] = (a[t - 1] + v_digits[t] - p[t]) / base
    zc = _sample_c(c, sigma, a, rng)
    return _gq_combine(zc, m_digits, v_digits, base, k)


def gauss_samp_gq_arb_base(u_coeffs: np.ndarray, stddev: float, k: int,
                           modulus: int, base: int, rng) -> np.ndarray:
    """(reference GaussSampGqArbBase) float-perturbation variant used by
    GaussSamp for arbitrary bases."""
    sigma = stddev / (base + 1)
    m_digits, l, h, c = _gq_scaffold(modulus, base, k)
    n = len(u_coeffs)
    v_digits = get_digits(np.asarray(u_coeffs, object), base, k)

    z = rng.normal(0.0, sigma, (k, n))
    p = np.zeros((k, n))
    for i in range(k - 1):
        p[i] = l[i] * z[i] + h[i + 1] * z[i + 1]
    p[k - 1] = h[k - 1] * z[k - 1]

    a = np.zeros((k, n))
    a[0] = (v_digits[0] - p[0]) / base
    for t in range(1, k):
        a[t] = (a[t - 1] + v_digits[t] - p[t]) / base
    zc = _sample_c(c, sigma, a, rng)
    return _gq_combine(zc, m_digits, v_digits, base, k)


# ---------------------------------------------------------------------------
# perturbation sampling in the cyclotomic field (Field2n recursion)
# ---------------------------------------------------------------------------

def zsample_f(f: Field2n, c: Field2n, rng) -> np.ndarray:
    """(reference ZSampleF) Sample an integer vector with covariance f,
    center c (both COEFFICIENT).  Returns [size] int64."""
    if f.size() == 1:
        val = sample_integers(rng, [c[0].real],
                              math.sqrt(max(f[0].real, 0.0)))
        return val.astype(np.int64)
    f0 = f.ExtractEven().SetFormat(EVALUATION)
    f1 = f.ExtractOdd().SetFormat(EVALUATION)
    c_perm = (c.ExtractEven(), c.ExtractOdd())
    q_z = zsample_sigma_2x2(f0, f1, f0, c_perm, rng)
    # InversePermute: [evens | odds] -> interleaved
    n2 = len(q_z)
    out = np.empty(n2, np.int64)
    out[0::2] = q_z[:n2 // 2]
    out[1::2] = q_z[n2 // 2:]
    return out


def zsample_sigma_2x2(a: Field2n, b: Field2n, d: Field2n, c,
                      rng) -> np.ndarray:
    """(reference ZSampleSigma2x2) 2x2 block Schur-complement sampling.
    a, b, d in EVALUATION; c = (c0, c1) Field2n in COEFFICIENT.
    Returns [2n] int64."""
    c0, c1 = c
    d_coeff = d.SetFormat(COEFFICIENT)
    q2 = zsample_f(d_coeff, c1, rng)
    q2_f = Field2n.from_int_vector(q2)

    q2_minus_c2 = (q2_f - c1).SwitchFormat()           # -> EVALUATION
    product = (b * d.Inverse() * q2_minus_c2).SetFormat(COEFFICIENT)
    c1_new = c0 + product

    f = (a - b * d.Inverse() * b.Transpose()).SetFormat(COEFFICIENT)
    q1 = zsample_f(f, c1_new, rng)
    return np.concatenate([q1, q2])


def sample_mat(A: Matrix, B: Matrix, D: Matrix, C: Matrix,
               rng) -> np.ndarray:
    """(reference SampleMat) recursive block sampling for matrices of
    Field2n; C is a column of COEFFICIENT-format centers.  Returns the
    stacked integer vector."""
    d_tot = C.GetRows()
    if d_tot == 2:
        return zsample_sigma_2x2(A(0, 0), B(0, 0), D(0, 0),
                                 (C(0, 0), C(1, 0)), rng)
    n = D(0, 0).size()
    dim_a = A.GetRows()
    dim_d = D.GetRows()
    alloc = lambda: Field2n.zeros(n, EVALUATION)

    c1 = C.ExtractRows(dim_a, d_tot - 1)
    c0 = C.ExtractRows(0, dim_a - 1)

    if dim_d == 1:
        d_eval = D(0, 0)
        q1 = zsample_f(d_eval.SetFormat(COEFFICIENT), c1(0, 0), rng)
        d_inverse = Matrix(alloc, 1, 1).set(0, 0, D(0, 0).Inverse())
        q_f1 = Matrix(alloc, 1, 1).set(
            0, 0, Field2n.from_int_vector(q1))
    elif dim_d == 2:
        q1 = zsample_sigma_2x2(D(0, 0), D(0, 1), D(1, 1),
                               (c1(0, 0), c1(1, 0)), rng)
        q_f1 = Matrix(alloc, 2, 1)
        for i in range(2):
            q_f1.set(i, 0, Field2n.from_int_vector(q1[i * n:(i + 1) * n]))
        det = D(0, 0) * D(1, 1) - D(0, 1) * D(1, 0)
        det_inv = det.Inverse()
        d_inverse = Matrix(alloc, 2, 2)
        d_inverse.set(0, 0, D(1, 1) * det_inv)
        d_inverse.set(0, 1, -D(0, 1) * det_inv)
        d_inverse.set(1, 0, -D(1, 0) * det_inv)
        d_inverse.set(1, 1, D(0, 0) * det_inv)
    else:
        na = (dim_d + 1) // 2
        nd = dim_d // 2
        new_a = Matrix(alloc, na, na)
        new_b = Matrix(alloc, na, nd)
        new_d = Matrix(alloc, nd, nd)
        for i in range(na):
            for j in range(na):
                new_a.set(i, j, D(i, j))
            for j in range(nd):
                new_b.set(i, j, D(i, j + na))
        for i in range(nd):
            for j in range(nd):
                new_d.set(i, j, D(i + na, j + na))
        q1 = sample_mat(new_a, new_b, new_d, c1, rng)
        q_f1 = Matrix(alloc, dim_d, 1)
        for i in range(dim_d):
            q_f1.set(i, 0, Field2n.from_int_vector(q1[i * n:(i + 1) * n]))
        det = D.Determinant()
        d_inverse = D.CofactorMatrix().Transpose().ScalarMult(det.Inverse())

    sigma_new = A - B * d_inverse * B.Transpose()
    diff = (q_f1 - c1).SetFormat(EVALUATION)
    c_new = (c0.SetFormat(EVALUATION)
             + B * d_inverse * diff).SetFormat(COEFFICIENT)

    na = (dim_a + 1) // 2
    nd = dim_a // 2
    new_a = Matrix(alloc, na, na)
    new_b = Matrix(alloc, na, nd)
    new_d = Matrix(alloc, nd, nd)
    for i in range(na):
        for j in range(na):
            new_a.set(i, j, sigma_new(i, j))
        for j in range(nd):
            new_b.set(i, j, sigma_new(i, j + na))
    for i in range(nd):
        for j in range(nd):
            new_d.set(i, j, sigma_new(i + na, j + na))
    q0 = sample_mat(new_a, new_b, new_d, c_new, rng)
    return np.concatenate([q0, q1])
