"""SchemeletRLWEMP round trips (reference: rlwe-mp.cpp)."""
import numpy as np
import pytest

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.pke.schemelet import SchemeletRLWEMP as SL


@pytest.fixture(scope="module")
def ctx():
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256, mult_depth=4,
                 scaling_mod_size=28, first_mod_size=30, batch_size=64,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=5)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    return cc, cc.KeyGen()


def test_encrypt_decrypt_modswitch(ctx):
    cc, kp = ctx
    big_q, pt_mod = 1 << 40, 256
    vals = np.array([5, -3, 17, 100, -120, 0, 1, 77] * 16)
    ct = SL.encrypt_coeff(cc, kp.secret_key, vals, big_q, pt_mod)
    dec = SL.decrypt_coeff(cc, kp.secret_key, ct, big_q, pt_mod)
    assert np.array_equal(dec, vals)
    ct2 = SL.mod_switch(ct, 1 << 30, big_q)
    dec2 = SL.decrypt_coeff(cc, kp.secret_key, ct2, 1 << 30, pt_mod)
    assert np.array_equal(dec2, vals)


def test_ckks_conversion(ctx):
    cc, kp = ctx
    big_q, pt_mod = 1 << 40, 256
    vals = np.arange(-64, 64)
    ct = SL.encrypt_coeff(cc, kp.secret_key, vals, big_q, pt_mod)
    ctk = SL.convert_rlwe_to_ckks(cc, ct, big_q, slots=128)
    back = SL.convert_ckks_to_rlwe(cc, ctk, big_q)
    dec = SL.decrypt_coeff(cc, kp.secret_key, back, big_q, pt_mod)
    assert np.array_equal(dec, vals)
