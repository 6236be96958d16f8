"""BV key-switching round-trip (reference: keyswitch-bv.cpp).

digit_size=0 (pure RNS decomposition) only suits deg-2 relinearization
(noise ~ q_i is absorbed by the Delta^2 scale); rotations need the
relinWindow digit decomposition.
"""
import numpy as np
import pytest

from openfhe_tpu.pke.constants import (KeySwitchTechnique, PKESchemeFeature,
                                       ScalingTechnique, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams


@pytest.mark.parametrize("digit_size,rot_tol", [(0, None), (5, 0.01)],
                         ids=["rns", "window5"])
def test_bv_keyswitch(digit_size, rot_tol):
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256, mult_depth=4,
                 scaling_mod_size=28, first_mod_size=30, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO,
                 ks_technique=KeySwitchTechnique.BV, digit_size=digit_size)
    cc = GenCryptoContext(p, seed=4)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    rng = np.random.default_rng(1)
    x = rng.normal(size=8) * 0.5
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    d = cc.Decrypt(kp.secret_key, cc.EvalMult(ct, ct)).values.real
    assert np.abs(d - x * x).max() < 1e-3
    if rot_tol is not None:
        cc.EvalRotateKeyGen(kp.secret_key, [1])
        d3 = cc.Decrypt(kp.secret_key, cc.EvalRotate(ct, 1)).values.real
        assert np.abs(d3 - np.roll(x, -1)).max() < rot_tol
