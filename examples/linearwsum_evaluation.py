"""Linear weighted sum of many ciphertexts.

Port of /root/reference src/pke/examples/linearwsum-evaluation.cpp:
EvalLinearWSum over a vector of ciphertexts with real weights.
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
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=2,
                 scaling_mod_size=28, first_mod_size=30, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=12)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE | PKESchemeFeature.ADVANCEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)

    rng = np.random.default_rng(0)
    vecs = [rng.uniform(-1, 1, 8) for _ in range(5)]
    weights = [3.0, 1.5, -0.75, 0.25, 2.25]
    cts = [cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(v, slots=8))
           for v in vecs]

    out = cc.EvalLinearWSum(cts, weights)
    got = cc.Decrypt(kp.secret_key, out).values.real
    want = sum(w * v for w, v in zip(weights, vecs))
    print("sum w_i*x_i =", np.round(got, 4))
    print("expected    =", np.round(want, 4))
    assert np.abs(got - want).max() < 1e-2
    print("linear weighted sum OK")


if __name__ == "__main__":
    main()
