"""Encrypted inner product, exact (BFV) and approximate (CKKS).

Port of /root/reference src/pke/examples/inner-product.cpp.
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


def bfv_inner_product():
    p = CCParams(scheme=Scheme.BFVRNS_SCHEME, ring_dim=1024, mult_depth=2,
                 plaintext_modulus=65537, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet)
    cc = GenCryptoContext(p, seed=2)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE | PKESchemeFeature.ADVANCEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalSumKeyGen(kp.secret_key)

    a = np.array([1, 2, 3, 4, 5, 6, 7, 8])
    b = np.array([8, 7, 6, 5, 4, 3, 2, 1])
    ca = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(a))
    cb = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(b))
    out = cc.EvalInnerProduct(ca, cb, 8)
    got = int(cc.Decrypt(kp.secret_key, out).values[0])
    print("BFV  <a,b> =", got, "expected", int(a @ b))
    assert got == a @ b


def ckks_inner_product():
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=3,
                 scaling_mod_size=28, first_mod_size=30, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=3)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE | PKESchemeFeature.ADVANCEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalSumKeyGen(kp.secret_key)

    a = np.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8])
    b = np.array([-0.8, 0.7, -0.6, 0.5, -0.4, 0.3, -0.2, 0.1])
    ca = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(a, slots=8))
    cb = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(b, slots=8))
    out = cc.EvalInnerProduct(ca, cb, 8)
    got = float(cc.Decrypt(kp.secret_key, out).values.real[0])
    print("CKKS <a,b> =", round(got, 5), "expected", round(float(a @ b), 5))
    assert abs(got - a @ b) < 1e-2


if __name__ == "__main__":
    bfv_inner_product()
    ckks_inner_product()
    print("inner product OK")
