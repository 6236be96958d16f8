"""CKKS basics: encrypt real vectors, add/mult/rotate, decrypt.

Port of /root/reference src/pke/examples/simple-real-numbers.cpp.
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

params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, mult_depth=2,
                  scaling_mod_size=28, first_mod_size=30, ring_dim=1 << 12,
                  batch_size=8,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
cc = GenCryptoContext(params)
cc.Enable(PKESchemeFeature.PKE)
cc.Enable(PKESchemeFeature.KEYSWITCH)
cc.Enable(PKESchemeFeature.LEVELEDSHE)
print(f"CKKS ring dimension: {cc.GetRingDimension()}")

keys = cc.KeyGen()
cc.EvalMultKeyGen(keys.secret_key)
cc.EvalRotateKeyGen(keys.secret_key, [1, -2])

x1 = np.array([0.25, 0.5, 0.75, 1.0, 2.0, 3.0, 4.0, 5.0])
x2 = np.array([5.0, 4.0, 3.0, 2.0, 1.0, 0.75, 0.5, 0.25])
c1 = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x1))
c2 = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x2))

c_add = cc.EvalAdd(c1, c2)
c_sub = cc.EvalSub(c1, c2)
c_scalar = cc.EvalMult(c1, 4.0)
c_mul = cc.EvalMult(c1, c2)
c_rot1 = cc.EvalRotate(c1, 1)
c_rot2 = cc.EvalRotate(c1, -2)

for name, ct, want in [("x1+x2", c_add, x1 + x2),
                       ("x1-x2", c_sub, x1 - x2),
                       ("4*x1", c_scalar, 4 * x1),
                       ("x1*x2", c_mul, x1 * x2),
                       ("rot(x1,1)", c_rot1, np.roll(x1, -1)),
                       ("rot(x1,-2)", c_rot2, np.roll(x1, 2))]:
    got = cc.Decrypt(keys.secret_key, ct).values.real[:8]
    print(f"{name:>10}: {np.round(got, 4)}  (max err "
          f"{np.abs(got - want).max():.2e})")
