"""Advanced CKKS bootstrapping: FFT-factorized transforms with level budgets.

Reference analog: /root/reference src/pke/examples/
advanced-ckks-bootstrapping.cpp — sparse packing with level_budget (3, 3)
(scaled to small parameters here so the example runs in minutes on CPU).
"""

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams


def main():
    level_budget = (2, 2)
    slots = 8

    params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256,
                      mult_depth=20, scaling_mod_size=28, first_mod_size=30,
                      security_level=SecurityLevel.HEStd_NotSet,
                      scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(params, seed=11)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
              PKESchemeFeature.FHE):
        cc.Enable(f)

    print(f"CKKS bootstrapping, N={cc.ring_dim}, slots={slots}, "
          f"level budget {level_budget} (FFT-factorized C2S/S2C)")
    cc.EvalBootstrapSetup(level_budget=level_budget, slots=slots)

    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalBootstrapKeyGen(kp.secret_key, slots)

    x = np.array([0.25, 0.5, 0.75, 1.0, 2.0, 3.0, 4.0, 5.0]) / 5.0
    pt = cc.MakeCKKSPackedPlaintext(x, slots=slots)
    ct = cc.Encrypt(kp.public_key, pt)
    print(f"towers before bootstrap: {cc.size_ql(ct.level)} (depleted "
          f"input would have 2)")

    refreshed = cc.EvalBootstrap(ct)
    print(f"towers after bootstrap:  {cc.size_ql(refreshed.level)}")

    dec = cc.Decrypt(kp.secret_key, refreshed)
    err = np.abs(dec.values.real - x).max()
    print(f"input : {np.round(x, 4)}")
    print(f"output: {np.round(dec.values.real, 4)}")
    print(f"max error: {err:.2e}")
    assert err < 0.1
    print("OK")


if __name__ == "__main__":
    main()
