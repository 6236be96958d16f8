"""Simple BGV integer SIMD arithmetic.

Port of /root/reference src/pke/examples/simple-integers-bgvrns.cpp:
additions, multiplications and rotations on packed integer vectors.
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

T = 12289
params = CCParams(scheme=Scheme.BGVRNS_SCHEME, plaintext_modulus=T,
                  mult_depth=2, ring_dim=1 << 10,
                  security_level=SecurityLevel.HEStd_NotSet)
cc = GenCryptoContext(params, seed=8)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE):
    cc.Enable(f)
keys = cc.KeyGen()
cc.EvalMultKeyGen(keys.secret_key)
cc.EvalRotateKeyGen(keys.secret_key, [1, 2, -1, -2])

v1 = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12], dtype=np.int64)
v2 = np.array([3, 2, 1, 4, 5, 6, 7, 8, 9, 10, 11, 12], dtype=np.int64)
v3 = np.array([1, 2, 5, 2, 5, 6, 7, 8, 9, 10, 11, 12], dtype=np.int64)
c1 = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(v1))
c2 = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(v2))
c3 = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(v3))

add12 = cc.EvalAdd(cc.EvalAdd(c1, c2), c3)
mul12 = cc.EvalMult(cc.EvalMult(c1, c2), c3)
rot1 = cc.EvalRotate(c1, 1)
rotm1 = cc.EvalRotate(c1, -1)

print("sum :", np.asarray(cc.Decrypt(keys.secret_key, add12).values[:12]))
print("prod:", np.asarray(cc.Decrypt(keys.secret_key, mul12).values[:12]) % T)
print("rot+1:", np.asarray(cc.Decrypt(keys.secret_key, rot1).values[:12]))
print("rot-1:", np.asarray(cc.Decrypt(keys.secret_key, rotm1).values[:12]))
assert (np.asarray(cc.Decrypt(keys.secret_key, add12).values[:12])
        == (v1 + v2 + v3)).all()
assert (np.asarray(cc.Decrypt(keys.secret_key, mul12).values[:12]) % T
        == (v1 * v2 * v3) % T).all()
print("OK")
