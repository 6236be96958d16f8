"""Arbitrary-cyclotomic transforms (reference: BluesteinFFTNat /
ChineseRemainderTransformArbNat, transformnat.h:379-560;
UnitTestTransform.cpp arbitrary-cyclotomic cases)."""
import numpy as np
import pytest

from openfhe_tpu.math import cyclotomic as cy
from openfhe_tpu.math import nbtheory as nb


def test_cyclotomic_poly():
    # Phi_1 = x-1, Phi_2 = x+1, Phi_4 = x^2+1, Phi_6 = x^2-x+1,
    # Phi_12 = x^4 - x^2 + 1, Phi_105 has a -2 coefficient
    assert cy.cyclotomic_poly(2) == (1, 1)
    assert cy.cyclotomic_poly(4) == (1, 0, 1)
    assert cy.cyclotomic_poly(6) == (1, -1, 1)
    assert cy.cyclotomic_poly(12) == (1, 0, -1, 0, 1)
    assert min(cy.cyclotomic_poly(105)) == -2


@pytest.mark.parametrize("m", [5, 12, 15])
def test_bluestein_matches_naive_dft(m):
    q = nb.first_prime(28, 2 * m)
    root = nb.root_of_unity(m, q)
    rng = np.random.default_rng(m)
    x = [int(v) for v in rng.integers(0, q, m)]
    got = cy.bluestein_fft(x, q, root)
    naive = [sum(x[j] * pow(root, j * k, q) for j in range(m)) % q
             for k in range(m)]
    assert got == naive
    assert cy.bluestein_fft(got, q, root, inverse=True) == x


@pytest.mark.parametrize("m", [22, 45])
def test_arb_transform_round_trip_and_multiply(m):
    q = nb.first_prime(28, 2 * m)
    t = nb.totient(m)
    rng = np.random.default_rng(m)
    a = [int(v) for v in rng.integers(0, q, t)]
    b = [int(v) for v in rng.integers(0, q, t)]
    assert cy.inverse_transform_arb(
        cy.forward_transform_arb(a, q, m), q, m) == a

    prod = cy.multiply_arb(a, b, q, m)
    # oracle: schoolbook multiply, reduce mod Phi_m
    phi = cy.cyclotomic_poly(m)
    full = [0] * (2 * t - 1)
    for i in range(t):
        for j in range(t):
            full[i + j] = (full[i + j] + a[i] * b[j]) % q
    for i in range(len(full) - 1, t - 1, -1):
        c = full[i]
        if c:
            for j in range(len(phi)):
                full[i - (len(phi) - 1) + j] = (
                    full[i - (len(phi) - 1) + j] - c * phi[j]) % q
    assert prod == full[:t]
