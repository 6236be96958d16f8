"""Security-level enforcement + device sampler statistics.

Reference analogs: the HE-standard table checks in
src/core/lib/lattice/stdlatticeparms.cpp (UnitTestSecurity-style
rejections) and the distribution-generator statistical oracles of
src/core/unittest/UnitTestDistrGen.cpp. Round-1 verdict gaps: "security
level untested in anger" and "device Gaussian sampler has no statistical
test on the device path".
"""
import math

import jax
import numpy as np
import pytest

from openfhe_tpu.lattice import stdlatticeparms as slp
from openfhe_tpu.math import sampling
from openfhe_tpu.pke.constants import (PKESchemeFeature, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams


# ---------------------------------------------------------------------------
# HE-standard table enforcement
# ---------------------------------------------------------------------------

def test_validate_rejects_oversized_q():
    """An explicit ring_dim too small for the requested chain must be
    rejected at context generation (stdlatticeparms.cpp max-logQ rows)."""
    p = CCParams(scheme=Scheme.BFVRNS_SCHEME, plaintext_modulus=65537,
                 mult_depth=8, ring_dim=1 << 12,
                 security_level=SecurityLevel.HEStd_128_classic)
    with pytest.raises(ValueError, match="standardized"):
        GenCryptoContext(p, seed=1)


def test_security_derived_ring_dim_matches_reference_table():
    """With no explicit ring_dim, paramgen must pick the smallest
    standardized N whose max logQ covers the chain — the reference's
    selection rule (rns-paramgen)."""
    p = CCParams(scheme=Scheme.BFVRNS_SCHEME, plaintext_modulus=65537,
                 mult_depth=2,
                 security_level=SecurityLevel.HEStd_128_classic)
    cc = GenCryptoContext(p, seed=1)
    log_qp = sum(math.log2(q) for q in cc.moduli_q) + sum(
        math.log2(q) for q in getattr(cc, "moduli_p", []) or [])
    n = cc.ring_dim
    table = slp.MAX_LOG_Q[(slp.TERNARY, SecurityLevel.HEStd_128_classic)]
    assert log_qp <= table[n], "chain exceeds the standardized bound"
    # minimality: the next-smaller standardized N must NOT suffice
    smaller = [m for m in sorted(table) if m < n]
    if smaller:
        assert log_qp > table[smaller[-1]], \
            "a smaller standardized ring would have sufficed"


def test_higher_levels_are_stricter():
    """256-bit classical admits less Q than 128-bit at every N."""
    t128 = slp.MAX_LOG_Q[(slp.TERNARY, SecurityLevel.HEStd_128_classic)]
    t256 = slp.MAX_LOG_Q[(slp.TERNARY, SecurityLevel.HEStd_256_classic)]
    for n in t256:
        assert t256[n] < t128[n]


def test_128_classic_context_end_to_end():
    """A real HEStd_128_classic context must build and round-trip
    (the round-1 suite ran HEStd_NotSet everywhere)."""
    p = CCParams(scheme=Scheme.BFVRNS_SCHEME, plaintext_modulus=65537,
                 mult_depth=1,
                 security_level=SecurityLevel.HEStd_128_classic)
    cc = GenCryptoContext(p, seed=3)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    a = np.arange(8, dtype=np.int64)
    ct = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(a))
    ct2 = cc.EvalMult(ct, ct)
    got = np.asarray(cc.Decrypt(kp.secret_key, ct2).values[:8]) % 65537
    assert np.array_equal(got, (a * a) % 65537)


# ---------------------------------------------------------------------------
# device sampler statistics (math/sampling.py — the jax.random path)
# ---------------------------------------------------------------------------

def test_device_gaussian_moments_and_tails():
    """Rounded-clipped device Gaussian: mean ~0, std ~sigma, correct
    support, and tail mass beyond 3 sigma close to the continuous
    Gaussian's (the round/clip distortion must be negligible at
    sigma=3.19)."""
    sigma = 3.19
    n = 1 << 18
    x = np.asarray(sampling.discrete_gaussian(
        jax.random.PRNGKey(7), (n,), sigma))
    assert abs(x.mean()) < 0.05
    assert abs(x.std() / sigma - 1.0) < 0.02
    bound = math.ceil(6 * sigma)
    assert x.min() >= -bound and x.max() <= bound
    # tail mass beyond +-3 sigma: continuous Gaussian ~ 0.0027
    tail = np.mean(np.abs(x) > 3 * sigma)
    assert 0.0005 < tail < 0.008


def test_device_gaussian_chi2_vs_discrete_gaussian():
    """Chi-squared of the device sampler's histogram against the rounded
    Gaussian pmf (the distribution it claims); dof-normalized statistic
    must be O(1)."""
    sigma = 3.19
    n = 1 << 18
    x = np.asarray(sampling.discrete_gaussian(
        jax.random.PRNGKey(3), (n,), sigma))
    lo, hi = -10, 10
    ks = np.arange(lo, hi + 1)
    from math import erf, sqrt
    probs = np.array([
        0.5 * (erf((k + 0.5) / (sigma * sqrt(2)))
               - erf((k - 0.5) / (sigma * sqrt(2)))) for k in ks])
    counts = np.array([(x == k).sum() for k in ks])
    expected = probs * n
    mask = expected > 10
    chi2 = ((counts[mask] - expected[mask]) ** 2 / expected[mask]).sum()
    dof = mask.sum() - 1
    assert chi2 / dof < 2.5, f"chi2/dof={chi2/dof:.2f}"


def test_device_ternary_uniform_and_sparse():
    n = 1 << 16
    x = np.asarray(sampling.ternary(jax.random.PRNGKey(5), (n,)))
    for v in (-1, 0, 1):
        assert abs(np.mean(x == v) - 1 / 3) < 0.02
    h = 192
    s = np.asarray(sampling.ternary(jax.random.PRNGKey(9), (n,),
                                    hamming_weight=h))
    assert int(np.sum(s != 0)) == h
    assert set(np.unique(s)).issubset({-1, 0, 1})


def test_api_parity_accessors():
    """Reference cryptocontext.h accessor surface (GetModulus,
    GetRootOfUnity, eval-key map (de)serialization methods, InPlace
    aliases) — smoke-level parity check."""
    p = CCParams(scheme=Scheme.BFVRNS_SCHEME, plaintext_modulus=65537,
                 mult_depth=1, ring_dim=1 << 10,
                 security_level=SecurityLevel.HEStd_NotSet)
    cc = GenCryptoContext(p, seed=2)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    q = cc.GetModulus()
    assert q == int(np.prod([int(m) for m in cc.moduli_q], dtype=object))
    psi = cc.GetRootOfUnity()
    q0 = int(cc.moduli_q[0])
    assert pow(psi, 2 * cc.ring_dim, q0) == 1
    assert pow(psi, cc.ring_dim, q0) == q0 - 1          # primitive 2N-th
    assert cc.GetScheme() == Scheme.BFVRNS_SCHEME
    assert cc.GetCryptoParameters() is cc.params

    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    blob = cc.SerializeEvalMultKey()
    cc.eval_mult_keys.clear()
    cc.DeserializeEvalMultKey(blob)
    a = np.arange(8, dtype=np.int64)
    ct = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(a))
    got = np.asarray(cc.Decrypt(
        kp.secret_key, cc.EvalMult(ct, ct)).values[:8]) % 65537
    np.testing.assert_array_equal(got, (a * a) % 65537)
