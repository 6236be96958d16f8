"""Composite scaling: high-precision CKKS on 32-bit words
(reference COMPOSITESCALING*, ckksrns-parametergeneration.cpp)."""
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams


def test_composite_mult_precision():
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256, mult_depth=4,
                 scaling_mod_size=50, first_mod_size=56, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.COMPOSITESCALINGAUTO)
    cc = GenCryptoContext(p, seed=4)
    assert cc.comp_deg == 2
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalRotateKeyGen(kp.secret_key, [1])
    rng = np.random.default_rng(1)
    x = rng.normal(size=8) * 0.5
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    d = cc.Decrypt(kp.secret_key, cc.EvalMult(ct, ct)).values.real
    # ~50-bit scale: precision far beyond the 28-bit single-word chain
    assert np.abs(d - x * x).max() < 1e-9
    ct3 = cc.EvalMult(cc.EvalMult(ct, ct), ct)
    d3 = cc.Decrypt(kp.secret_key, ct3).values.real
    assert np.abs(d3 - x ** 3).max() < 1e-9
    d4 = cc.Decrypt(kp.secret_key, cc.EvalRotate(ct, 1)).values.real
    assert np.abs(d4 - np.roll(x, -1)).max() < 1e-9
