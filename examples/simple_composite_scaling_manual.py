"""CKKS with manually-chosen composite scaling degree.

Port of /root/reference src/pke/examples/simple-composite-scaling-manual.cpp:
COMPOSITESCALINGMANUAL with an explicit composite degree d=4 and register
word size 27 — the user takes responsibility for the (scaling_mod_size,
composite_degree, register_word_size) consistency instead of letting
AUTO derive the degree. Demonstrates the basic op set (add, sub, scalar
and ciphertext mult, rotations) at a 95-bit effective scale on 32-bit
device words.
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

mult_depth = 2
params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=1 << 9,
                  mult_depth=mult_depth,
                  first_mod_size=96, scaling_mod_size=95,
                  composite_degree=4, register_word_size=27,
                  batch_size=8,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.COMPOSITESCALINGMANUAL)
cc = GenCryptoContext(params, seed=5)
print(f"CKKS scheme is using ring dimension {cc.ring_dim}")
print(f"composite degree d = {cc.comp_deg}, "
      f"register word size = {params.register_word_size}\n")

cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
          | PKESchemeFeature.LEVELEDSHE)
keys = cc.KeyGen()
cc.EvalMultKeyGen(keys.secret_key)
cc.EvalRotateKeyGen(keys.secret_key, [1, -2])

x1 = np.array([0.25, 0.5, 0.75, 1.0, 2.0, 3.0, 4.0, 5.0])
x2 = np.array([5.0, 4.0, 3.0, 2.0, 1.0, 0.75, 0.5, 0.25])
pt1 = cc.MakeCKKSPackedPlaintext(x1, slots=8)
pt2 = cc.MakeCKKSPackedPlaintext(x2, slots=8)
print("Input x1:", x1)
print("Input x2:", x2)

c1 = cc.Encrypt(keys.public_key, pt1)
c2 = cc.Encrypt(keys.public_key, pt2)

c_add = cc.EvalAdd(c1, c2)
c_sub = cc.EvalSub(c1, c2)
c_scalar = cc.EvalMult(c1, 4.0)
c_mul = cc.EvalMult(c1, c2)                 # MANUAL: rescale by hand
c_mul = cc.Rescale(c_mul)
c_rot1 = cc.EvalRotate(c1, 1)
c_rot2 = cc.EvalRotate(c1, -2)
# ciphertext +- double
c_sub_d = cc.EvalSub(c1, 0.5)
c_add_nd = cc.EvalAdd(c1, -0.5)


def check(name, ct, want, lo=0, n=8):
    got = cc.Decrypt(keys.secret_key, ct).values.real[lo:n]
    err = np.abs(got - want).max()
    print(f"{name}: {np.round(got, 8)}   (max err {err:.2e})")
    assert err < 1e-8
    return got


print("\nResults of homomorphic computations:")
check("x1 + x2", c_add, x1 + x2)
check("x1 - x2", c_sub, x1 - x2)
check("4 * x1 ", c_scalar, 4 * x1)
check("x1 * x2", c_mul, x1 * x2)
check("x1 rot(1) ", c_rot1, x1[1:], n=7)
check("x1 rot(-2)", c_rot2, x1[:6], lo=2)
check("x1 - 0.5", c_sub_d, x1 - 0.5)
check("x1 + (-0.5)", c_add_nd, x1 - 0.5)
print("\nsimple-composite-scaling-manual: all checks passed")
