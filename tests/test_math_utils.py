"""Matrix / Field2n / Hermite / FFT-transform unit tests.

Reference analog: src/core/unittest/UnitTestMatrix.cpp,
UnitTestField2n.cpp, and the ckksrns-utils FFT collapse algebra.
"""
import math

import numpy as np

from openfhe_tpu.lattice.field2n import COEFFICIENT, EVALUATION, Field2n
from openfhe_tpu.math.hermite import get_hermite_trig_coefficients
from openfhe_tpu.math.matrix import Matrix


def _num_alloc():
    return lambda: 0.0


def test_matrix_basic_ops():
    m = Matrix(_num_alloc(), 2, 2)
    m.set(0, 0, 1.0).set(0, 1, 2.0).set(1, 0, 3.0).set(1, 1, 4.0)
    n = Matrix(_num_alloc(), 2, 2).Identity()
    assert m.Mult(n) == m
    assert (m + m).data[1][1] == 8.0
    assert (m - m).data[0][0] == 0.0
    assert m.Transpose().data[0][1] == 3.0
    assert abs(m.Determinant() - (-2.0)) < 1e-12
    assert m.Norm() == 4.0


def test_matrix_strassen_matches_mult():
    rng = np.random.default_rng(0)
    a = Matrix(_num_alloc(), 8, 8)
    b = Matrix(_num_alloc(), 8, 8)
    for r in range(8):
        for c in range(8):
            a.set(r, c, float(rng.integers(-5, 6)))
            b.set(r, c, float(rng.integers(-5, 6)))
    assert a.StrassenMult(b) == a.Mult(b)


def test_matrix_stack_extract():
    m = Matrix(_num_alloc(), 2, 3).Fill(1.0)
    v = m.VStack(Matrix(_num_alloc(), 1, 3).Fill(2.0))
    assert v.GetRows() == 3 and v.data[2][0] == 2.0
    h = m.HStack(Matrix(_num_alloc(), 2, 1).Fill(3.0))
    assert h.GetCols() == 4 and h.data[0][3] == 3.0
    assert v.ExtractRow(2).data[0][1] == 2.0
    assert v.ExtractRows(0, 1).GetRows() == 2
    assert h.ExtractCol(3).data[1][0] == 3.0


def test_matrix_gadget_vector():
    g = Matrix(_num_alloc(), 1, 4).GadgetVector(2)
    assert [g(0, i) for i in range(4)] == [1, 2, 4, 8]


def test_field2n_format_roundtrip():
    rng = np.random.default_rng(1)
    x = Field2n(rng.normal(size=16), COEFFICIENT)
    y = x.SwitchFormat().SwitchFormat()
    assert np.allclose(x.data, y.data)


def test_field2n_times_is_negacyclic_convolution():
    rng = np.random.default_rng(2)
    a = rng.normal(size=8)
    b = rng.normal(size=8)
    fa = Field2n(a, COEFFICIENT).SetFormat(EVALUATION)
    fb = Field2n(b, COEFFICIENT).SetFormat(EVALUATION)
    prod = (fa * fb).SetFormat(COEFFICIENT)
    # negacyclic reference
    full = np.convolve(a, b)
    ref = full[:8].astype(complex)
    ref[:7] -= full[8:]
    assert np.allclose(prod.data, ref, atol=1e-9)


def test_field2n_transpose_consistent():
    """Transpose in COEFFICIENT == Transpose in EVALUATION."""
    rng = np.random.default_rng(3)
    x = Field2n(rng.normal(size=16), COEFFICIENT)
    t1 = x.Transpose().SetFormat(EVALUATION)
    t2 = x.SetFormat(EVALUATION).Transpose()
    assert np.allclose(t1.data, t2.data, atol=1e-9)


def test_field2n_inverse():
    rng = np.random.default_rng(4)
    x = Field2n(rng.normal(size=8), COEFFICIENT).SetFormat(EVALUATION)
    one = x * x.Inverse()
    assert np.allclose(one.data, 1.0, atol=1e-9)


def test_field2n_permute_roundtrip():
    rng = np.random.default_rng(5)
    x = Field2n(rng.normal(size=16), COEFFICIENT)
    assert np.allclose(x.Permute().InversePermute().data, x.data)
    assert np.allclose(x.ExtractEven().data, x.data[0::2])
    assert np.allclose(x.ExtractOdd().data, x.data[1::2])


def _hermite_brute(func, p, order, scale):
    """Literal port of the reference loops (hermite.cpp) as oracle."""
    if order != 1:
        raise NotImplementedError
    coeffs = np.zeros(p, complex)
    for i in range(p):
        for j in range(p):
            coeffs[i] += float(func(j)) * np.exp(-2j * np.pi * i * j / p)
        coeffs[i] *= (p - i) / (p * p) / scale
    coeffs[0] /= 2.0
    return coeffs


def test_hermite_order1_matches_reference_loops():
    func = lambda j: (j * j + 3) % 7
    p = 16
    ours = get_hermite_trig_coefficients(func, p, 1, 1.0)
    ref = _hermite_brute(func, p, 1, 1.0)
    assert np.allclose(ours, ref[:len(ours)], atol=1e-9)


def test_hermite_order1_interpolates():
    """Re(sum_k c_k e^{2 pi i k x / p}) reproduces f at integer points."""
    p = 8
    func = lambda j: int(j % 3)
    coeffs = get_hermite_trig_coefficients(func, p, 1, 1.0)
    for x in range(p):
        val = sum(c * np.exp(2j * np.pi * k * x / p)
                  for k, c in enumerate(coeffs))
        assert abs(2 * val.real - func(x)) < 1e-6


def test_hermite_orders_run():
    func = lambda j: int(j % 5)
    for order in (2, 3):
        coeffs = get_hermite_trig_coefficients(func, 16, order, 1.0)
        assert len(coeffs) >= 1


def test_blake2_prng_deterministic():
    """utils/prng.py (reference Blake2Engine): keyed counter stream is
    deterministic and seed-sensitive."""
    from openfhe_tpu.utils.prng import Blake2Engine
    a = Blake2Engine(seed=np.arange(64, dtype=np.uint8))
    b = Blake2Engine(seed=np.arange(64, dtype=np.uint8))
    c = Blake2Engine(seed=np.zeros(64, np.uint8))
    xa = a.random_uint32s(32)
    assert np.array_equal(xa, b.random_uint32s(32))
    assert not np.array_equal(xa, c.random_uint32s(32))
    assert xa.dtype == np.uint32


def test_openfhe_exception_caller_info():
    from openfhe_tpu.utils.exception import (OpenFHEException,
                                             openfhe_throw)
    try:
        openfhe_throw("bad config")
        assert False
    except OpenFHEException as e:
        assert "bad config" in str(e)
        assert "test_math_utils" in str(e)


def test_generic_dgg_statistics():
    """dgg_generic.py (reference discretegaussiangeneratorgeneric.cpp):
    runtime (center, std) sampling from fixed base samplers."""
    from openfhe_tpu.math.dgg_generic import (BaseSampler, BitGenerator,
                                              DiscreteGaussianGeneratorGeneric,
                                              KNUTH_YAO, PEIKERT)
    bg = BitGenerator()
    log_base = 2
    base_std = 34.0
    samplers = [BaseSampler(i / 4.0, base_std, bg, PEIKERT)
                for i in range(4)]
    gen = DiscreteGaussianGeneratorGeneric(samplers, base_std, log_base,
                                           n_smooth=16.0)
    xs = np.array([gen.generate_integer(5.25, 300.0) for _ in range(800)],
                  np.float64)
    assert abs(xs.mean() - 5.25) < 40.0
    assert abs(xs.std() - 300.0) < 60.0

    # Knuth-Yao base sampler agrees with Peikert statistically
    ky = BaseSampler(0.5, 12.0, bg, KNUTH_YAO)
    ys = np.array([ky.generate_integer() for _ in range(800)], np.float64)
    assert abs(ys.mean() - 0.5) < 1.5
    assert abs(ys.std() - 12.0) < 2.5
