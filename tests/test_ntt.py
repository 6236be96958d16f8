"""NTT unit tests vs. exact big-int oracle.

Reference analog: src/core/unittest/UnitTestNTT.cpp / UnitTestTransform.cpp —
round-trip and known-answer checks for the negacyclic transform.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from openfhe_tpu.lattice.basis import make_basis, _bitrev_indices
from openfhe_tpu.math import nbtheory
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv


def naive_negacyclic_ntt(a, q, n):
    """O(N^2) oracle: X[j] = sum_i a[i] * psi^(i*(2*brv(j)+... )) — here we
    just evaluate a at psi^(2j+1) in natural j order."""
    psi = nbtheory.root_of_unity(2 * n, q)
    out = []
    for j in range(n):
        w = pow(psi, 2 * j + 1, q)
        acc, wp = 0, 1
        for i in range(n):
            acc = (acc + a[i] * wp) % q
            wp = wp * w % q
        out.append(acc)
    return out


@pytest.mark.parametrize("n", [8, 64, 256])
def test_roundtrip(n):
    q = nbtheory.first_prime(28, 2 * n)
    b = make_basis([q], n)
    rng = np.random.default_rng(0)
    x = rng.integers(0, q, size=(3, 1, n), dtype=np.uint32)
    y = ntt_fwd(jnp.asarray(x), b)
    z = np.asarray(ntt_inv(y, b))
    np.testing.assert_array_equal(z, x)


def test_matches_naive_evaluation():
    n = 16
    q = nbtheory.first_prime(20, 2 * n)
    b = make_basis([q], n)
    rng = np.random.default_rng(1)
    a = rng.integers(0, q, size=n).tolist()
    expected_natural = naive_negacyclic_ntt(a, q, n)
    got = np.asarray(ntt_fwd(jnp.asarray(np.array([a], np.uint32)), b))[0]
    # our EVAL layout is bit-reversed: got[j] = a(psi^(2*brv(j)+1))
    rev = _bitrev_indices(n)
    reordered = got[np.argsort(rev)] if False else got[rev]
    # try both conventions; exactly one must match
    assert (list(got[rev]) == expected_natural
            or list(got[np.argsort(rev)]) == expected_natural
            or list(got) == [expected_natural[r] for r in rev])


def test_pointwise_mult_is_negacyclic_convolution():
    n = 32
    q = nbtheory.first_prime(24, 2 * n)
    b = make_basis([q], n)
    rng = np.random.default_rng(2)
    a = rng.integers(0, q, size=(1, n), dtype=np.uint32)
    c = rng.integers(0, q, size=(1, n), dtype=np.uint32)
    # exact negacyclic product mod q via python ints
    prod = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            sgn = 1
            if k >= n:
                k -= n
                sgn = -1
            prod[k] = (prod[k] + sgn * int(a[0, i]) * int(c[0, j])) % q
    fa = ntt_fwd(jnp.asarray(a), b)
    fc = ntt_fwd(jnp.asarray(c), b)
    from openfhe_tpu.math.modops import mul_mod
    fprod = mul_mod(fa, fc, b.q, b.r32, b.r32_sh, b.m32)
    got = np.asarray(ntt_inv(fprod, b))[0]
    assert got.tolist() == prod
