"""2-party interactive CKKS bootstrapping.

Port of /root/reference src/pke/examples/interactive-bootstrapping.cpp.
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

params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=8,
                  scaling_mod_size=28, first_mod_size=30, batch_size=8,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
cc = GenCryptoContext(params)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.MULTIPARTY):
    cc.Enable(f)

kp1 = cc.MultipartyKeyGen()                 # server
kp2 = cc.MultipartyKeyGen(kp1.public_key)   # client
joint_pk = kp2.public_key

x = np.array([0.25, -0.5, 0.75, 0.1, -0.3, 0.8, -0.2, 0.6])
ct = cc.Encrypt(joint_pk, cc.MakeCKKSPackedPlaintext(x, slots=8))
ct = cc.LevelReduce(ct, 5)
print("towers before:", cc.size_ql(ct.level))

ct_adj = cc.IntBootAdjustScale(ct)
share_server = cc.IntBootDecrypt(kp1.secret_key, ct_adj)
c1_only = ct_adj.replace(elements=(ct_adj.elements[1],))
share_client = cc.IntBootDecrypt(kp2.secret_key, c1_only)
share_client = cc.IntBootEncrypt(joint_pk, share_client)
refreshed = cc.IntBootAdd(share_client, share_server)
print("towers after :", cc.size_ql(refreshed.level))

p1 = cc.MultipartyDecryptLead([refreshed], kp1.secret_key)
p2 = cc.MultipartyDecryptMain([refreshed], kp2.secret_key)
out = cc.MultipartyDecryptFusion([p1[0], p2[0]], refreshed)
print("decrypted:", np.round(out.values.real[:8], 4))
print("expected :", x)
