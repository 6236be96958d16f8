"""Smooth function evaluation via Chebyshev interpolation (CKKS).

Port of /root/reference src/pke/examples/function-evaluation.cpp.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import math
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams

params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=10,
                  scaling_mod_size=28, first_mod_size=30, batch_size=8,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
cc = GenCryptoContext(params)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE):
    cc.Enable(f)
keys = cc.KeyGen()
cc.EvalMultKeyGen(keys.secret_key)

x = np.array([-0.9, -0.6, -0.3, 0.0, 0.3, 0.6, 0.9, 0.95])
ct = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))

ct_logistic = cc.EvalLogistic(ct, -1, 1, 32)
got = cc.Decrypt(keys.secret_key, ct_logistic).values.real[:8]
want = 1 / (1 + np.exp(-x))
print("logistic:", np.round(got, 5), "max err:",
      f"{np.abs(got - want).max():.2e}")

ct_sin = cc.EvalSin(ct, -1, 1, 32)
got = cc.Decrypt(keys.secret_key, ct_sin).values.real[:8]
print("sin     :", np.round(got, 5), "max err:",
      f"{np.abs(got - np.sin(x)).max():.2e}")
