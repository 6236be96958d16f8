"""CKKS bootstrapping: refresh a depleted ciphertext.

Port of /root/reference src/pke/examples/simple-ckks-bootstrapping.cpp.
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

params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256, mult_depth=18,
                  scaling_mod_size=28, first_mod_size=30,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
cc = GenCryptoContext(params)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
          PKESchemeFeature.FHE):
    cc.Enable(f)

slots = 8
cc.EvalBootstrapSetup(slots=slots)
keys = cc.KeyGen()
cc.EvalMultKeyGen(keys.secret_key)
cc.EvalBootstrapKeyGen(keys.secret_key, slots)

x = np.array([0.25, 0.5, -0.75, 0.1, -0.3, 0.8, -0.2, 0.6])
ct = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x, slots=slots))
ct = cc.LevelReduce(ct, cc.size_ql(0) - 3)    # deplete the level budget
print("towers before bootstrap:", cc.size_ql(ct.level))
ct = cc.EvalBootstrap(ct)
print("towers after bootstrap :", cc.size_ql(ct.level))
got = cc.Decrypt(keys.secret_key, ct).values.real[:slots]
print("decrypted:", np.round(got, 3))
print("expected :", x)
