"""Advanced CKKS usage: rescaling techniques, fast (hoisted) rotations.

Port of /root/reference src/pke/examples/advanced-real-numbers.cpp:
FIXEDMANUAL vs FLEXIBLEAUTO rescaling, EvalFastRotation with a shared
precomputation, and cross-level additions.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams

x = np.array([1.0, 1.01, 1.02, 1.03, 1.04, 1.05, 1.06, 1.07])


def demo(technique):
    params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256,
                      mult_depth=5, scaling_mod_size=28, first_mod_size=30,
                      batch_size=8,
                      security_level=SecurityLevel.HEStd_NotSet,
                      scaling_technique=technique)
    cc = GenCryptoContext(params, seed=3)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    keys = cc.KeyGen()
    cc.EvalMultKeyGen(keys.secret_key)
    ct = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    # c * c -> (manual: Rescale) -> * c -> + c
    c2 = cc.EvalMult(ct, ct)
    if technique == ScalingTechnique.FIXEDMANUAL:
        c2 = cc.Rescale(c2)
    c3 = cc.EvalAdd(cc.EvalMult(c2, ct), ct)
    got = cc.Decrypt(keys.secret_key, c3).values.real[:8]
    want = x ** 3 + x
    print(f"{technique.name}: max err {np.abs(got - want).max():.2e}")
    assert np.abs(got - want).max() < 1e-3
    return cc, keys, ct


cc, keys, ct = demo(ScalingTechnique.FIXEDMANUAL)
demo(ScalingTechnique.FLEXIBLEAUTO)

# hoisted rotations: one precomputation shared by many rotations
cc.EvalRotateKeyGen(keys.secret_key, [1, 2, 3])
pre = cc.EvalFastRotationPrecompute(ct)
for r in (1, 2, 3):
    rot = cc.EvalFastRotation(ct, r, 2 * cc.ring_dim, pre)
    got = cc.Decrypt(keys.secret_key, rot).values.real[:8 - r]
    assert np.abs(got - x[r:]).max() < 1e-3
print("hoisted rotations OK")
