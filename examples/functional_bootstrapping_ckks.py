"""Vectorized functional bootstrapping over CKKS (EvalFBT).

Port of /root/reference src/pke/examples/functional-bootstrapping-ckks.cpp:
a lookup table applied to a batch of Z_p digits packed in one RLWE
ciphertext, evaluated through the CKKS schemelet machinery
(ckksrns-fhe.cpp:2820-3280, schemelet/rlwe-mp.cpp).
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
from openfhe_tpu.pke.schemelet import SchemeletRLWEMP as SL

n = 512
params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=n, mult_depth=22,
                  scaling_mod_size=28, first_mod_size=30, batch_size=8,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
cc = GenCryptoContext(params, seed=14)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
          PKESchemeFeature.FHE):
    cc.Enable(f)

slots = 8
p_in = 8
cc.EvalFBTSetup(num_slots=slots, p_in=p_in)
keys = cc.KeyGen()
cc.EvalMultKeyGen(keys.secret_key)
cc.EvalFBTKeyGen(keys.secret_key, slots)

digits = np.array([0, 3, 1, 7, 2, 6, 5, 4])
lut = np.array([1, 2, 4, 0, 6, 3, 7, 5])     # arbitrary f: Z_8 -> Z_8
q0 = cc.moduli_q[0]
last = len(cc.moduli_q) - 1
ct_polys = SL.encrypt_coeff(cc, keys.secret_key, digits, q0, p_in,
                            level=last)
ct = SL.convert_rlwe_to_ckks(cc, ct_polys, q0, slots=slots, level=last,
                             scale=q0 / p_in)
ct = ct.replace(key_tag=keys.secret_key.key_tag)

out = cc.EvalFBT(ct, lut, p_in, decode=False)
got = np.round(cc.Decrypt(keys.secret_key, out).values.real[:slots])
print("digits:", digits)
print("f(digits):", got.astype(int), "expected:", lut[digits])
assert np.array_equal(got.astype(int), lut[digits])
print("OK")
