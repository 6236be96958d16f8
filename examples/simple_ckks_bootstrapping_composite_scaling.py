"""Single-shot CKKS bootstrapping under composite scaling.

Port of /root/reference
src/pke/examples/simple-ckks-bootstrapping-composite-scaling.cpp:
COMPOSITESCALINGAUTO with 59-bit effective scales assembled from
register_word_size=27 device-word primes (composite degree 3), sparse
packing (8 slots), level budget {3, 3} — the ciphertext is depleted to
its last level, bootstrapped, and decrypted at the refreshed budget
(reference cpp:95-130).
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

params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256, mult_depth=20,
                  scaling_mod_size=59, first_mod_size=64,
                  composite_degree=3, register_word_size=27,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.COMPOSITESCALINGAUTO)
cc = GenCryptoContext(params, seed=7)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
          PKESchemeFeature.FHE):
    cc.Enable(f)
print(f"CKKS scheme is using ring dimension {cc.ring_dim}")
print(f"compositeDegree={cc.comp_deg} "
      f"modBitWidth={59 / cc.comp_deg:.2f} targetHWArchWordSize=27\n")

slots = 8                                        # sparse packing
cc.EvalBootstrapSetup(level_budget=(3, 3), slots=slots)
kp = cc.KeyGen()
cc.EvalMultKeyGen(kp.secret_key)
cc.EvalBootstrapKeyGen(kp.secret_key, slots)

x = np.array([0.25, 0.5, 0.75, 1.0, 2.0, 3.0, 4.0, 5.0]) / 5.0
pt = cc.MakeCKKSPackedPlaintext(x, slots=slots)
ct = cc.Encrypt(kp.public_key, pt)
ct = cc.LevelReduce(ct, cc.params.mult_depth - 1)   # deplete the budget
print(f"Initial number of levels remaining: "
      f"{cc.params.mult_depth - ct.level}")

ct_boot = cc.EvalBootstrap(ct)
print(f"Number of levels remaining after bootstrapping: "
      f"{cc.params.mult_depth - ct_boot.level}")

dec = cc.Decrypt(kp.secret_key, ct_boot)
err = np.abs(dec.values.real[:slots] - x).max()
prec = -np.log2(err) if err > 0 else 40.0
print(f"Output after bootstrapping: {np.round(dec.values.real[:slots], 6)}")
print(f"max err {err:.3e} (~{prec:.1f} bits precision)")
assert err < 1e-2
print("OK")
