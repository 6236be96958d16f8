"""Threshold-CKKS interactive (2-party) bootstrapping.

Port of /root/reference src/pke/examples/
tckks-interactive-mp-bootstrapping.cpp (+ the Chebyshev variant): two
parties refresh a depleted joint-key ciphertext without any party seeing
the plaintext, then continue with a Chebyshev function evaluation.
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

params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256, mult_depth=7,
                  scaling_mod_size=28, first_mod_size=30, batch_size=8,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
cc = GenCryptoContext(params, seed=13)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
          PKESchemeFeature.MULTIPARTY):
    cc.Enable(f)

# joint key: party 1 then party 2 (round-robin)
kp1 = cc.MultipartyKeyGen()
kp2 = cc.MultipartyKeyGen(kp1.public_key)
joint_pk = kp2.public_key
tag = joint_pk.key_tag

# joint relinearization key (2-round protocol, threshold-fhe.cpp flow) —
# needed for the Chebyshev evaluation after the refresh
ek1 = cc.KeySwitchGen(kp1.secret_key, kp1.secret_key)
ek2 = cc.MultiKeySwitchGen(kp2.secret_key, kp2.secret_key, ek1)
ek12 = cc.MultiAddEvalKeys(ek1, ek2, tag)
ek1m = cc.MultiMultEvalKey(ek12, kp1.secret_key, tag)
ek2m = cc.MultiMultEvalKey(ek12, kp2.secret_key, tag)
cc.InsertEvalMultKey(cc.MultiAddEvalMultKeys(ek1m, ek2m, tag), tag)

x = np.array([0.12, -0.24, 0.36, -0.48, 0.5, -0.6, 0.7, -0.8])
ct = cc.Encrypt(joint_pk, cc.MakeCKKSPackedPlaintext(x, slots=8))
ct = cc.LevelReduce(ct, 4)                   # deplete the budget
print("towers before interactive bootstrap:", cc.size_ql(ct.level))

# interactive bootstrap: adjust, party2 partial-decrypts, party1 completes
ct_adj = cc.IntMPBootAdjustScale(ct)
a = cc.IntMPBootRandomElementGen(joint_pk)
c1_only = ct_adj.replace(elements=(ct_adj.elements[1],))
share1 = cc.IntMPBootDecrypt(kp1.secret_key, ct_adj, a)    # lead: c0+c1*s
share2 = cc.IntMPBootDecrypt(kp2.secret_key, c1_only, a)   # main: c1*s
shares = cc.IntMPBootAdd([share1, share2])
fresh = cc.IntMPBootEncrypt(joint_pk, shares, a, ct_adj)
print("towers after  interactive bootstrap:", cc.size_ql(fresh.level))
assert cc.size_ql(fresh.level) > cc.size_ql(ct.level)

# verify by threshold decryption
lead = cc.MultipartyDecryptLead([fresh], kp1.secret_key)[0]
main = cc.MultipartyDecryptMain([fresh], kp2.secret_key)[0]
got = cc.MultipartyDecryptFusion([lead, main], fresh).values.real[:8]
print("refreshed decrypt err:", np.abs(got - x).max())
assert np.abs(got - x).max() < 1e-2

# Chebyshev variant: evaluate logistic(x) on the refreshed ciphertext
cheb = cc.EvalLogistic(fresh, -1.0, 1.0, 8)
lead = cc.MultipartyDecryptLead([cheb], kp1.secret_key)[0]
main = cc.MultipartyDecryptMain([cheb], kp2.secret_key)[0]
got = cc.MultipartyDecryptFusion([lead, main], cheb).values.real[:8]
want = 1.0 / (1.0 + np.exp(-x))
print("logistic after refresh err:", np.abs(got - want).max())
assert np.abs(got - want).max() < 5e-2
print("OK")
