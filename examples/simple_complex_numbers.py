"""CKKS complex arithmetic: complex inputs, complex scalar ops, conjugate.

Port of /root/reference src/pke/examples/simple-complex-numbers.cpp
(COMPLEX CKKSDataType): slots carry genuine complex values end to end.
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
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=3,
                 scaling_mod_size=28, first_mod_size=30, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=10)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)

    z = np.array([1 + 1j, 2 - 1j, -0.5 + 0.25j, 0.75, 1j, -1j, 0.5 + 0.5j,
                  -0.25 - 0.75j])
    w = np.array([0.5 - 0.5j] * 8)
    cz = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(z, slots=8))
    cw = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(w, slots=8))

    got = cc.Decrypt(kp.secret_key, cc.EvalMult(cz, cw)).values
    print("z*w      =", np.round(got, 4))
    assert np.abs(got - z * w).max() < 1e-2

    got = cc.Decrypt(kp.secret_key, cc.EvalMult(cz, 1j)).values
    assert np.abs(got - z * 1j).max() < 1e-2

    got = cc.Decrypt(kp.secret_key, cc.EvalAdd(cz, 1 - 2j)).values
    assert np.abs(got - (z + 1 - 2j)).max() < 1e-2
    print("complex arithmetic OK")


if __name__ == "__main__":
    main()
