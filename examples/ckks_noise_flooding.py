"""CKKS noise-flooding decryption: estimate, then re-run flooded.

Port of /root/reference src/pke/examples/ckks-noise-flooding.cpp
(NOISE_FLOODING_DECRYPT + EXEC_NOISE_ESTIMATION two-pass workflow,
CKKS_NOISE_FLOODING.md).
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.pke.constants import (DecryptionNoiseMode, ExecutionMode,
                                       PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams


def run(execution_mode, noise_estimate=0.0, seed=6):
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=3,
                 scaling_mod_size=28, first_mod_size=30, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO,
                 decryption_noise_mode=(
                     DecryptionNoiseMode.NOISE_FLOODING_DECRYPT),
                 execution_mode=execution_mode,
                 noise_estimate=noise_estimate)
    cc = GenCryptoContext(p, seed=seed)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)

    x = np.linspace(-1, 1, 8)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    out = cc.EvalMult(cc.EvalAdd(ct, ct), ct)        # f(x) = 2x^2
    return cc.Decrypt(kp.secret_key, out), x


def main():
    # pass 1: measure the noise of the computation
    pt, x = run(ExecutionMode.EXEC_NOISE_ESTIMATION)
    log_err = pt.GetLogError()
    print(f"estimated log2(noise) = {log_err:.1f}")

    # pass 2: re-run with flooding calibrated to the estimate
    pt2, x = run(ExecutionMode.EXEC_EVALUATION, noise_estimate=log_err)
    got = pt2.values.real
    want = 2 * x * x
    print("flooded decrypt:", np.round(got, 3))
    print("expected       :", np.round(want, 3))
    assert np.abs(got - want).max() < 0.05
    print("ckks noise flooding OK")


if __name__ == "__main__":
    main()
