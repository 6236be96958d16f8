"""Two-round (Meta-BTS) CKKS bootstrapping under composite scaling,
fully packed.

Port of /root/reference
src/pke/examples/iterative-ckks-bootstrapping-composite-scaling.cpp:
ring dimension 128 with FULL packing (numSlots = M/4 = 64),
COMPOSITESCALINGAUTO with 61-bit effective scales assembled from
register_word_size=27 device-word primes (composite degree 3), level
budget {3,3}, and two bootstrap iterations — the second iteration feeds
the measured error back through for ~double the precision
(reference cpp:137-159).
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

params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=128, mult_depth=24,
                  scaling_mod_size=61, first_mod_size=66,
                  composite_degree=3, register_word_size=27,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.COMPOSITESCALINGAUTO)
cc = GenCryptoContext(params, seed=11)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
          PKESchemeFeature.FHE):
    cc.Enable(f)
print(f"CKKS scheme is using ring dimension {cc.ring_dim}")
print(f"compositeDegree={cc.comp_deg} "
      f"modBitWidth={61 / cc.comp_deg:.2f} targetHWArchWordSize=27\n")

slots = cc.ring_dim // 2            # full packing (reference M/4)
cc.EvalBootstrapSetup(level_budget=(3, 3), slots=slots)
keys = cc.KeyGen()
cc.EvalMultKeyGen(keys.secret_key)
cc.EvalBootstrapKeyGen(keys.secret_key, slots)

rng = np.random.default_rng(42)
x = rng.uniform(-1, 1, slots)
ct = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x, slots=slots))
ct = cc.LevelReduce(ct, 22)         # deplete the level budget first

one = cc.EvalBootstrap(ct)
r1 = cc.Decrypt(keys.secret_key, one).values.real[:slots]
prec1 = abs(np.log2(np.abs(r1 - x).mean()))
two = cc.EvalBootstrap(ct, num_iterations=2,
                       precision=int(np.floor(prec1)))
r2 = cc.Decrypt(keys.secret_key, two).values.real[:slots]
prec2 = abs(np.log2(np.abs(r2 - x).mean()))
print(f"Bootstrapping precision after 1 iteration:  {prec1:.1f} bits")
print(f"Bootstrapping precision after 2 iterations: {prec2:.1f} bits")
assert prec2 > prec1 + 2, "iterative bootstrap should gain precision"
print("OK")
