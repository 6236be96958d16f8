"""CKKS <-> FHEW scheme switching round-trip tests.

Reference analog: src/pke/unittest/utckksrns/UnitTestSchemeSwitch.cpp.
Min/max tournaments are exercised in examples (runtime-heavy); the compare
path covers the same sign pipeline.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.pke.schemeswitch import SchSwchParams

SLOTS = 8


@pytest.fixture(scope="module")
def ssw_ctx():
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=1024, mult_depth=16,
                 scaling_mod_size=28, first_mod_size=30, batch_size=SLOTS,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=2)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
              PKESchemeFeature.SCHEMESWITCH, PKESchemeFeature.FHE):
        cc.Enable(f)
    sp = SchSwchParams(security_level_fhew="TOY", num_slots_ckks=SLOTS,
                       ctxt_mod_size_fhew_large_prec=17,
                       ctxt_mod_size_fhew_intermed_swch=27)
    lwe_sk = cc.EvalSchemeSwitchingSetup(sp)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalSchemeSwitchingKeyGen(kp, lwe_sk)
    cc.GetBinCCForSchemeSwitch().BTKeyGen(lwe_sk)
    return cc, kp, lwe_sk


def test_ckks_to_fhew(ssw_ctx):
    cc, kp, lwe_sk = ssw_ctx
    p_lwe = 16
    cc.EvalCKKStoFHEWPrecompute(scale=1.0 / p_lwe)
    x = np.arange(SLOTS, dtype=np.float64)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=SLOTS))
    lwe_cts = cc.EvalCKKStoFHEW(ct, SLOTS)
    got = cc.GetBinCCForSchemeSwitch().Decrypt(
        lwe_sk, lwe_cts.replace(pt_modulus=p_lwe))
    assert np.array_equal(got, x.astype(np.int64))


def test_fhew_to_ckks(ssw_ctx):
    cc, kp, lwe_sk = ssw_ctx
    bits = jnp.array([0, 1, 1, 0, 1, 0, 0, 1], jnp.uint32)
    lwe_in = cc.GetBinCCForSchemeSwitch().Encrypt(
        lwe_sk, bits, p=4, q=cc._schswch.modulus_lwe)
    ct_back = cc.EvalFHEWtoCKKS(lwe_in, SLOTS, SLOTS)
    dec = cc.Decrypt(kp.secret_key, ct_back).values.real[:SLOTS]
    assert np.abs(dec - np.asarray(bits)).max() < 0.05


def test_compare(ssw_ctx):
    cc, kp, lwe_sk = ssw_ctx
    cc.EvalCompareSwitchPrecompute(p_lwe=8, scale_sign=1.0)
    x1 = np.array([0.1, 0.5, 0.9, 0.2, 0.7, 0.3, 0.6, 0.4])
    x2 = np.array([0.5, 0.5, 0.1, 0.8, 0.2, 0.9, 0.1, 0.45])
    c1 = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x1,
                                                              slots=SLOTS))
    c2 = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x2,
                                                              slots=SLOTS))
    out = cc.EvalCompareSchemeSwitching(c1, c2, SLOTS, SLOTS)
    dec = cc.Decrypt(kp.secret_key, out).values.real[:SLOTS]
    assert np.abs(dec - (x1 < x2)).max() < 0.1


def test_min_max(ssw_ctx):
    cc, kp, lwe_sk = ssw_ctx
    vals = np.array([0.6, 0.2, 0.8, 0.4, 0, 0, 0, 0])
    ctv = cc.Encrypt(kp.public_key,
                     cc.MakeCKKSPackedPlaintext(vals, slots=SLOTS))
    ct_min, ct_ind = cc.EvalMinSchemeSwitching(ctv, kp.public_key, 4,
                                               SLOTS, p_lwe=8)
    assert abs(cc.Decrypt(kp.secret_key, ct_min).values.real[0] - 0.2) < 0.05
    ind = cc.Decrypt(kp.secret_key, ct_ind).values.real[:4]
    assert np.abs(ind - [0, 1, 0, 0]).max() < 0.1
    ct_max, _ = cc.EvalMaxSchemeSwitching(ctv, kp.public_key, 4, SLOTS,
                                          p_lwe=8)
    assert abs(cc.Decrypt(kp.secret_key, ct_max).values.real[0] - 0.8) < 0.05
