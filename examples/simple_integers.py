"""BFV integer SIMD: exact packed arithmetic.

Port of /root/reference src/pke/examples/simple-integers.cpp.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams

params = CCParams(scheme=Scheme.BFVRNS_SCHEME, plaintext_modulus=65537,
                  mult_depth=2, ring_dim=1 << 12,
                  security_level=SecurityLevel.HEStd_NotSet)
cc = GenCryptoContext(params)
cc.Enable(PKESchemeFeature.PKE)
cc.Enable(PKESchemeFeature.KEYSWITCH)
cc.Enable(PKESchemeFeature.LEVELEDSHE)

keys = cc.KeyGen()
cc.EvalMultKeyGen(keys.secret_key)

v1 = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
v2 = np.array([3, 2, 1, 4, 5, 6, 7, 8, 9, 10, 11, 12])
c1 = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(v1))
c2 = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(v2))

c_add = cc.EvalAdd(c1, c2)
c_mult = cc.EvalMult(c1, c2)

add = cc.Decrypt(keys.secret_key, c_add).values[:12]
mul = cc.Decrypt(keys.secret_key, c_mult).values[:12]
print("v1+v2:", add, "exact:", np.array_equal(add, v1 + v2))
print("v1*v2:", mul, "exact:", np.array_equal(mul, v1 * v2))
