"""Two-round (Meta-BTS) CKKS bootstrapping for higher precision.

Port of /root/reference src/pke/examples/iterative-ckks-bootstrapping.cpp:
one EvalBootstrap pass limits precision; a second iteration with the
measured precision feeds the error back through for ~double the bits.
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

# composite ~2^50 scales: precision is approximation-limited, so the
# second Meta-BTS round has headroom to show its gain (the reference
# example uses 59-bit scales on 64-bit words for the same reason)
params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256, mult_depth=24,
                  scaling_mod_size=50, first_mod_size=56, batch_size=8,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.COMPOSITESCALINGAUTO)
cc = GenCryptoContext(params, seed=2)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
          PKESchemeFeature.FHE):
    cc.Enable(f)

slots = 8
cc.EvalBootstrapSetup(slots=slots)
keys = cc.KeyGen()
cc.EvalMultKeyGen(keys.secret_key)
cc.EvalBootstrapKeyGen(keys.secret_key, slots)

x = np.array([0.111111, 0.222222, 0.333333, 0.444444,
              0.555555, 0.666666, 0.777777, 0.888888])
ct = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x, slots=slots))
ct = cc.LevelReduce(ct, 22)       # deplete the level budget first

one = cc.EvalBootstrap(ct)                      # single pass
err1 = np.abs(cc.Decrypt(keys.secret_key, one).values.real[:slots] - x).max()
prec1 = -np.log2(err1)
two = cc.EvalBootstrap(ct, num_iterations=2,
                       precision=int(np.floor(prec1)))
err2 = np.abs(cc.Decrypt(keys.secret_key, two).values.real[:slots] - x).max()
prec2 = -np.log2(err2)
print(f"single-pass precision: {prec1:.1f} bits")
print(f"two-round  precision: {prec2:.1f} bits")
assert prec2 > prec1 + 2, "iterative bootstrap should gain precision"
print("OK")
