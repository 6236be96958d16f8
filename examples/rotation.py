"""SIMD slot rotations in BFV and CKKS, incl. hoisted fast rotations.

Port of /root/reference src/pke/examples/rotation.cpp.
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


def bfv_rotation():
    p = CCParams(scheme=Scheme.BFVRNS_SCHEME, ring_dim=1024, mult_depth=1,
                 plaintext_modulus=65537, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet)
    cc = GenCryptoContext(p, seed=4)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE)
    kp = cc.KeyGen()
    cc.EvalRotateKeyGen(kp.secret_key, [1, 2, -1])

    x = np.arange(1, 9)
    ct = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(x))
    # rotations act on the full slot row (N/2 slots); unfilled slots are 0
    row = np.zeros(cc.ring_dim // 2, np.int64)
    row[:8] = x
    for r in (1, 2, -1):
        got = cc.Decrypt(kp.secret_key, cc.EvalRotate(ct, r)).values[:8]
        want = np.roll(row, -r)[:8]
        print(f"BFV  rot({r:+d}) =", got)
        assert np.array_equal(got, want)


def ckks_hoisted_rotations():
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=2,
                 scaling_mod_size=28, first_mod_size=30, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=5)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE)
    kp = cc.KeyGen()
    rots = [1, 2, 3]
    cc.EvalRotateKeyGen(kp.secret_key, rots)

    x = np.linspace(-1, 1, 8)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    # hoisting: one digit decomposition shared by all rotations
    digits = cc.EvalFastRotationPrecompute(ct)
    for r in rots:
        out = cc.EvalFastRotation(ct, r, 2 * cc.ring_dim, digits)
        got = cc.Decrypt(kp.secret_key, out).values.real
        assert np.abs(got - np.roll(x, -r)).max() < 1e-3
        print(f"CKKS fastrot({r:+d}) ~", np.round(got[:4], 4))


if __name__ == "__main__":
    bfv_rotation()
    ckks_hoisted_rotations()
    print("rotation OK")
