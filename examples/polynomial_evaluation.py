"""Homomorphic polynomial evaluation over CKKS.

Port of /root/reference src/pke/examples/polynomial-evaluation.cpp:
evaluate two polynomials by EvalPoly (linear for low degree,
Paterson-Stockmeyer for high degree) and compare against the plaintext
computation.
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


def main():
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=10,
                 scaling_mod_size=28, first_mod_size=30, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=1)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE | PKESchemeFeature.ADVANCEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)

    x = np.array([0.5, 0.7, 0.9, 0.95, 0.93, 0.2, -0.4, -0.9])
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))

    # low degree -> EvalPolyLinear path
    c1 = [0.15, 0.75, 0.0, 1.25, 1.0]
    out1 = cc.Decrypt(kp.secret_key, cc.EvalPoly(ct, c1)).values.real
    want1 = np.polyval(list(reversed(c1)), x)
    print("f1(x)     =", np.round(out1, 5))
    print("expected  =", np.round(want1, 5))
    assert np.abs(out1 - want1).max() < 1e-2

    # higher degree -> Paterson-Stockmeyer path
    c2 = [1, 0.5, 0.25, 0.125, 0.0625, 0.03, 0.01, 0.005, 0.002, 0.001,
          0.0005, 0.0002, 0.0001]
    out2 = cc.Decrypt(kp.secret_key, cc.EvalPoly(ct, c2)).values.real
    want2 = np.polyval(list(reversed(c2)), x)
    print("f2(x)     =", np.round(out2, 5))
    print("expected  =", np.round(want2, 5))
    assert np.abs(out2 - want2).max() < 1e-2
    print("polynomial evaluation OK")


if __name__ == "__main__":
    main()
