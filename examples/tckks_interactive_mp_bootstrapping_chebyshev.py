"""Threshold-CKKS 3-party interactive bootstrap + Chebyshev series.

Port of /root/reference
src/pke/examples/tckks-interactive-mp-bootstrapping-Chebyshev.cpp:
three parties hold shares of a joint key; a depleted ciphertext is
refreshed by the interactive (1-round online) MP bootstrap with COMPACT
compression, then the reference's Chebyshev series (cpp:248-260) is
evaluated on the refreshed ciphertext and threshold-decrypted.
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

print("Interactive (3P) Bootstrapping Ciphertext [Chebyshev] (TCKKS) "
      "started ...")

params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256, mult_depth=10,
                  scaling_mod_size=28, first_mod_size=30, batch_size=16,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.FLEXIBLEAUTO,
                  interactive_boot_compression_level="COMPACT")
cc = GenCryptoContext(params, seed=21)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
          PKESchemeFeature.MULTIPARTY):
    cc.Enable(f)

# --- 3-party round-robin joint key ---
kp1 = cc.MultipartyKeyGen()
kp2 = cc.MultipartyKeyGen(kp1.public_key)
kp3 = cc.MultipartyKeyGen(kp2.public_key)
joint_pk = kp3.public_key
tag = joint_pk.key_tag
sks = [kp1.secret_key, kp2.secret_key, kp3.secret_key]

# --- joint relin key (round-robin Multi* protocol) ---
ek1 = cc.KeySwitchGen(kp1.secret_key, kp1.secret_key)
ek2 = cc.MultiKeySwitchGen(kp2.secret_key, kp2.secret_key, ek1)
ek3 = cc.MultiKeySwitchGen(kp3.secret_key, kp3.secret_key, ek2)
ek123 = cc.MultiAddEvalKeys(cc.MultiAddEvalKeys(ek1, ek2, tag), ek3, tag)
m1 = cc.MultiMultEvalKey(ek123, kp1.secret_key, tag)
m2 = cc.MultiMultEvalKey(ek123, kp2.secret_key, tag)
m3 = cc.MultiMultEvalKey(ek123, kp3.secret_key, tag)
cc.InsertEvalMultKey(
    cc.MultiAddEvalMultKeys(cc.MultiAddEvalMultKeys(m1, m2, tag), m3, tag),
    tag)

# secret input shared by the 3 parties (reference cpp:221)
x = np.array([-4.0, -3.2, -2.1, -1.0, 0.0, 1.0, 2.1, 3.2])
ct = cc.Encrypt(joint_pk, cc.MakeCKKSPackedPlaintext(x, slots=16))
ct = cc.LevelReduce(ct, 7)                        # deplete the budget
print("towers before interactive bootstrap:", cc.size_ql(ct.level))

# --- interactive MP bootstrap: leader = party 1, round-robin shares ---
ct_adj = cc.IntMPBootAdjustScale(ct)
a = cc.IntMPBootRandomElementGen(joint_pk)
c1_only = ct_adj.replace(elements=(ct_adj.elements[1],))
shares = [cc.IntMPBootDecrypt(sks[0], ct_adj, a)]          # lead: c0+c1*s
shares += [cc.IntMPBootDecrypt(sk, c1_only, a) for sk in sks[1:]]
merged = cc.IntMPBootAdd(shares)
fresh = cc.IntMPBootEncrypt(joint_pk, merged, a, ct_adj)
print("towers after  interactive bootstrap:", cc.size_ql(fresh.level))
assert cc.size_ql(fresh.level) > cc.size_ql(ct.level)

# --- the reference's Chebyshev series on [-5, 5] (cpp:248-260) ---
coefficients = [1.0, 0.558971, 0.0, -0.0943712, 0.0, 0.0215023, 0.0,
                -0.00505348, 0.0, 0.00119324, 0.0, -0.000281928, 0.0,
                6.66001e-05, 0.0, -1.57274e-05]
a_lo, b_hi = -5.0, 5.0
ct_cheb = cc.EvalChebyshevSeries(fresh, coefficients, a_lo, b_hi)

# threshold decrypt: lead + mains, then fusion
lead = cc.MultipartyDecryptLead([ct_cheb], sks[0])[0]
mains = [cc.MultipartyDecryptMain([ct_cheb], sk)[0] for sk in sks[1:]]
got = cc.MultipartyDecryptFusion([lead] + mains, ct_cheb).values.real[:8]


def cheb_eval(coeffs, lo, hi, t):
    # EvalChebyshevSeries uses the c0/2 convention (pke/advanced.py:285,
    # matching the reference's EvalChebyshevSeriesPS)
    u = (2 * t - lo - hi) / (hi - lo)
    acc = coeffs[0] / 2.0 * np.ones_like(u)
    prev, cur = np.ones_like(u), u
    for c in coeffs[1:]:
        acc = acc + c * cur
        prev, cur = cur, 2 * u * cur - prev
    return acc


want = cheb_eval(coefficients, a_lo, b_hi, x)
err = np.abs(got - want).max()
print("Chebyshev after refresh, max err:", err)
assert err < 5e-2
print("Interactive (3P) Bootstrapping Ciphertext [Chebyshev] (TCKKS) "
      "terminated gracefully!")
