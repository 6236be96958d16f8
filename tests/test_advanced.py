"""AdvancedSHE tests (reference: function-evaluation / advanced examples)."""
import math

import numpy as np
import pytest

from openfhe_tpu.math.chebyshev import (eval_chebyshev_coefficients,
                                        long_division_chebyshev)
from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams


def cheb_eval(coeffs, x):
    """c0/2 + sum c_k T_k(x) — not used; here plain sum f_j T_j."""
    acc = 0.0
    for j, c in enumerate(coeffs):
        acc += c * math.cos(j * math.acos(max(-1.0, min(1.0, x))))
    return acc


def test_chebyshev_interpolation_accuracy():
    c = eval_chebyshev_coefficients(math.sin, -2.0, 2.0, 30)
    for x in np.linspace(-2, 2, 17):
        y = (2 * x - (-2.0) - 2.0) / 4.0 * 2 / 2  # map to [-1,1]: (x-a)*2/(b-a)-1
        ymap = (x + 2.0) / 2.0 - 1.0
        val = c[0] / 2 + sum(c[k] * math.cos(k * math.acos(ymap))
                             for k in range(1, len(c)))
        assert abs(val - math.sin(x)) < 1e-9


def test_long_division_identity():
    rng = np.random.default_rng(0)
    f = rng.normal(size=14).tolist()
    g = [0.0] * 5
    g[4] = 1.0  # T_4
    q, r = long_division_chebyshev(f, g)
    # verify pointwise: f(x) = q(x) * T_4(x) + r(x)
    for x in np.linspace(-1, 1, 9):
        fx = cheb_eval(f, x)
        qx = cheb_eval(q, x)
        rx = cheb_eval(r, x)
        t4 = math.cos(4 * math.acos(x))
        assert abs(fx - (qx * t4 + rx)) < 1e-8


@pytest.fixture(scope="module")
def ckks():
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=9,
                 scaling_mod_size=28, first_mod_size=30, batch_size=256,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=5)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE | PKESchemeFeature.ADVANCEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalSumKeyGen(kp.secret_key)
    return cc, kp


def test_eval_sum(ckks):
    cc, kp = ckks
    x = np.arange(cc.slots, dtype=float) / cc.slots
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x))
    dec = cc.Decrypt(kp.secret_key, cc.EvalSum(ct)).values
    assert abs(dec[0].real - x.sum()) < 1e-2


def test_eval_inner_product(ckks):
    cc, kp = ckks
    rng = np.random.default_rng(2)
    x = rng.normal(size=cc.slots) * 0.3
    y = rng.normal(size=cc.slots) * 0.3
    cx = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x))
    cy = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(y))
    dec = cc.Decrypt(kp.secret_key, cc.EvalInnerProduct(cx, cy)).values
    assert abs(dec[0].real - np.dot(x, y)) < 5e-2


def test_eval_add_mult_many(ckks):
    cc, kp = ckks
    xs = [np.full(cc.slots, 0.5 + 0.1 * i) for i in range(4)]
    cts = [cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x))
           for x in xs]
    s = cc.Decrypt(kp.secret_key, cc.EvalAddMany(cts)).values
    assert abs(s[0].real - sum(x[0] for x in xs)) < 1e-3
    m = cc.Decrypt(kp.secret_key, cc.EvalMultMany(cts)).values
    expected = np.prod([x[0] for x in xs])
    assert abs(m[0].real - expected) < 1e-2


def test_eval_poly_linear(ckks):
    cc, kp = ckks
    x = np.linspace(-0.9, 0.9, cc.slots)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x))
    coeffs = [0.25, -0.5, 1.0, 0.75]  # 0.25 - 0.5x + x^2 + 0.75x^3
    dec = cc.Decrypt(kp.secret_key, cc.EvalPolyLinear(ct, coeffs)).values
    expected = 0.25 - 0.5 * x + x ** 2 + 0.75 * x ** 3
    assert np.abs(dec.real - expected).max() < 5e-2


def test_eval_logistic_chebyshev(ckks):
    cc, kp = ckks
    x = np.linspace(-4, 4, cc.slots)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x))
    out = cc.EvalLogistic(ct, -5.0, 5.0, 27)
    dec = cc.Decrypt(kp.secret_key, out).values
    expected = 1.0 / (1.0 + np.exp(-x))
    assert np.abs(dec.real - expected).max() < 5e-2


def test_precomp_poly_and_chebyshev(ckks):
    """EvalPowers/EvalPolyWithPrecomp + EvalChebyPolys/
    EvalChebyshevSeriesWithPrecomp (reference cryptocontext.h:2716-2820):
    shared bases across series."""
    cc, kp = ckks
    x = np.linspace(-0.9, 0.9, 8)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))

    c1 = [0.5, 1.0, 0.25, 0.0, 0.125]
    c2 = [0.0, -1.0, 0.0, 0.5, 0.0]
    pows = cc.EvalPowers(ct, c1)
    for c in (c1, c2):
        got = cc.Decrypt(kp.secret_key,
                         cc.EvalPolyWithPrecomp(pows, c)).values.real
        want = np.polyval(list(reversed(c)), x)
        assert np.abs(got - want).max() < 1e-3, c

    cheb = [1.0, 0.5, 0.25, 0.125]
    basis = cc.EvalChebyPolys(ct, cheb)
    got = cc.Decrypt(kp.secret_key, cc.EvalChebyshevSeriesWithPrecomp(
        basis, cheb)).values.real
    want = np.polynomial.chebyshev.chebval(x, [cheb[0] / 2] + cheb[1:])
    assert np.abs(got - want).max() < 1e-3


def test_alias_api_surface(ckks):
    """InPlace/Mutable/AtIndex aliases (reference cryptocontext.h) behave
    like their functional counterparts."""
    cc, kp = ckks
    x = np.linspace(-1, 1, 8)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    d = cc.Decrypt(kp.secret_key, cc.EvalAddInPlace(ct, ct)).values.real
    assert np.abs(d - 2 * x).max() < 1e-3
    d = cc.Decrypt(kp.secret_key, cc.EvalSquareInPlace(ct)).values.real
    assert np.abs(d - x * x).max() < 1e-3
    d = cc.Decrypt(kp.secret_key,
                   cc.EvalMultAndRelinearize(ct, ct)).values.real
    assert np.abs(d - x * x).max() < 1e-3
    cc.EvalAtIndexKeyGen(kp.secret_key, [2])
    d = cc.Decrypt(kp.secret_key, cc.EvalAtIndex(ct, 2)).values.real
    assert np.abs(d - np.roll(x, -2)).max() < 1e-3


def test_hermite_trig_series_homomorphic(ckks):
    """EvalHermiteTrigSeries: evaluate f through the Hermite trig
    interpolation on a ciphertext of exp(2*pi*i*m/p)."""
    cc, kp = ckks
    p_mod = 8
    func = lambda j: int((3 * j + 1) % 5)
    m = np.arange(8) % p_mod
    z = np.exp(2j * np.pi * m / p_mod)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(z, slots=8))
    out = cc.EvalHermiteTrigSeries(ct, func, p_mod, order=1)
    got = 2 * cc.Decrypt(kp.secret_key, out).values.real
    want = np.array([func(int(j)) for j in m], float)
    assert np.abs(got - want).max() < 1e-2
