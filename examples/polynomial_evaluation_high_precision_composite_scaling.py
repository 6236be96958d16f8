"""High-precision polynomial evaluation with composite scaling.

Port of /root/reference
src/pke/examples/polynomial-evaluation-high-precision-composite-scaling.cpp:
EvalPoly over the reference's two coefficient vectors at composite
degree 3, with timing, mirroring the d=3 parameter block at cpp:106-108.
The reference's exact firstMod=96 needs 32-bit primes at d=3; our device
words keep moduli below 2^31, so the first modulus is 90 bits (still
~2^30 of precision head-room beyond a single-word chain).
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
from openfhe_tpu.utils.profiling import TIC, TOC_MS

print("\n======EXAMPLE FOR EVALPOLY========\n")

params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=1 << 9,
                  mult_depth=6,
                  first_mod_size=90, scaling_mod_size=80,
                  composite_degree=3, register_word_size=32,
                  batch_size=8,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.COMPOSITESCALINGAUTO)
cc = GenCryptoContext(params, seed=9)
cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
          | PKESchemeFeature.LEVELEDSHE | PKESchemeFeature.ADVANCEDSHE)

x = np.array([0.5, 0.7, 0.9, 0.95, 0.93])
coeffs1 = [0.15, 0.75, 0, 1.25, 0, 0, 1, 0, 1, 2, 0, 1, 0, 0, 0, 0, 1]
coeffs2 = [1, 2, 3, 4, 5, -1, -2, -3, -4, -5,
           0.1, 0.2, 0.3, 0.4, 0.5, -0.1, -0.2, -0.3, -0.4, -0.5,
           0.1, 0.2, 0.3, 0.4, 0.5, -0.1, -0.2, -0.3, -0.4, -0.5]

keys = cc.KeyGen()
cc.EvalMultKeyGen(keys.secret_key)
ct = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))

t = TIC()
r1 = cc.EvalPoly(ct, coeffs1)
t1 = TOC_MS(t, r1.elements[0])
t = TIC()
r2 = cc.EvalPoly(ct, coeffs2)
t2 = TOC_MS(t, r2.elements[0])

want1 = np.polyval(list(reversed(coeffs1)), x)
want2 = np.polyval(list(reversed(coeffs2)), x)
got1 = cc.Decrypt(keys.secret_key, r1).values.real[:5]
got2 = cc.Decrypt(keys.secret_key, r2).values.real[:5]

print("Result of evaluating a polynomial with coefficients", coeffs1)
print("  ", np.round(got1, 10))
print("   expected:", np.round(want1, 10))
print(f"   Evaluation time: {t1:.2f} ms, max err {np.abs(got1-want1).max():.2e}")
assert np.abs(got1 - want1).max() < 1e-8

print("Result of evaluating a polynomial with coefficients", coeffs2)
print("  ", np.round(got2, 10))
print("   expected:", np.round(want2, 10))
print(f"   Evaluation time: {t2:.2f} ms, max err {np.abs(got2-want2).max():.2e}")
assert np.abs(got2 - want2).max() < 1e-8
print("\nhigh-precision EvalPoly passed")
