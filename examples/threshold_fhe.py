"""Threshold FHE: joint keygen, shared evaluation, distributed decryption.

Port of /root/reference src/pke/examples/threshold-fhe.cpp.
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

params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=3,
                  scaling_mod_size=28, first_mod_size=30, batch_size=8,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
cc = GenCryptoContext(params)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.MULTIPARTY):
    cc.Enable(f)

# round-robin joint key generation across three parties
kp1 = cc.MultipartyKeyGen()
kp2 = cc.MultipartyKeyGen(kp1.public_key)
kp3 = cc.MultipartyKeyGen(kp2.public_key)
joint_pk = kp3.public_key

x = np.array([0.5, -1.0, 2.0, 0.25, 1.5, -0.5, 0.75, -2.0])
ct = cc.Encrypt(joint_pk, cc.MakeCKKSPackedPlaintext(x, slots=8))
ct = cc.EvalAdd(ct, ct)

# distributed decryption: lead + mains, then fusion
p1 = cc.MultipartyDecryptLead([ct], kp1.secret_key)
p2 = cc.MultipartyDecryptMain([ct], kp2.secret_key)
p3 = cc.MultipartyDecryptMain([ct], kp3.secret_key)
out = cc.MultipartyDecryptFusion([p1[0], p2[0], p3[0]], ct)
print("2*x:", np.round(out.values.real[:8], 4))
print("err:", np.abs(out.values.real[:8] - 2 * x).max())
