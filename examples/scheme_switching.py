"""CKKS <-> FHEW scheme switching and encrypted comparison.

Port of /root/reference src/pke/examples/scheme-switching.cpp.
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
from openfhe_tpu.pke.schemeswitch import SchSwchParams

params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=1024,
                  mult_depth=16, scaling_mod_size=28, first_mod_size=30,
                  batch_size=8, security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
cc = GenCryptoContext(params)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
          PKESchemeFeature.SCHEMESWITCH, PKESchemeFeature.FHE):
    cc.Enable(f)

slots = 8
sp = SchSwchParams(security_level_fhew="TOY", num_slots_ckks=slots,
                   ctxt_mod_size_fhew_large_prec=17)
lwe_sk = cc.EvalSchemeSwitchingSetup(sp)
keys = cc.KeyGen()
cc.EvalMultKeyGen(keys.secret_key)
cc.EvalSchemeSwitchingKeyGen(keys, lwe_sk)
cc.GetBinCCForSchemeSwitch().BTKeyGen(lwe_sk)

# CKKS -> FHEW: move integer slots into LWE ciphertexts
p_lwe = 16
cc.EvalCKKStoFHEWPrecompute(scale=1.0 / p_lwe)
x = np.arange(slots, dtype=float)
ct = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x, slots=slots))
lwe_cts = cc.EvalCKKStoFHEW(ct, slots)
dec = cc.GetBinCCForSchemeSwitch().Decrypt(
    lwe_sk, lwe_cts.replace(pt_modulus=p_lwe))
print("CKKS->FHEW:", dec, "expected:", x.astype(int))

# encrypted comparison via FHEW sign
cc.EvalCompareSwitchPrecompute(p_lwe=8)
x1 = np.array([0.1, 0.5, 0.9, 0.2, 0.7, 0.3, 0.6, 0.4])
x2 = np.array([0.5, 0.5, 0.1, 0.8, 0.2, 0.9, 0.1, 0.45])
c1 = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x1, slots=slots))
c2 = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x2, slots=slots))
cmp_ct = cc.EvalCompareSchemeSwitching(c1, c2, slots, slots)
got = cc.Decrypt(keys.secret_key, cmp_ct).values.real[:slots]
print("x1 < x2  :", np.round(got, 2), "expected:", (x1 < x2).astype(float))
