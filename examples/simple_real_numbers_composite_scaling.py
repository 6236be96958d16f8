"""CKKS with composite scaling: ~2^50 scales from pairs of <2^27 moduli.

Port of /root/reference src/pke/examples/
simple-real-numbers-composite-scaling.cpp (+ simple-composite-scaling-
manual.cpp): high-precision real arithmetic on 32-bit device words
(registerWordSize analog, COMPOSITESCALING* in ckksrns-parametergeneration
.cpp:57-135).
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

for tech in (ScalingTechnique.COMPOSITESCALINGAUTO,
             ScalingTechnique.COMPOSITESCALINGMANUAL):
    params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256,
                      mult_depth=4, scaling_mod_size=50, first_mod_size=56,
                      batch_size=8,
                      security_level=SecurityLevel.HEStd_NotSet,
                      scaling_technique=tech)
    cc = GenCryptoContext(params, seed=9)
    print(f"{tech.name}: composite degree {cc.comp_deg}")
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    keys = cc.KeyGen()
    cc.EvalMultKeyGen(keys.secret_key)
    x = np.array([0.25, 0.5, 0.75, 1.0, 2.0, 3.0, 4.0, 5.0])
    ct = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    c2 = cc.EvalMult(ct, ct)
    if tech == ScalingTechnique.COMPOSITESCALINGMANUAL:
        c2 = cc.Rescale(c2)
    c3 = cc.EvalAdd(cc.EvalMult(c2, ct), ct)
    got = cc.Decrypt(keys.secret_key, c3).values.real[:8]
    want = x ** 3 + x
    err = np.abs(got - want).max()
    print(f"  x^3+x max err {err:.2e} (~{-np.log2(err):.0f} bits)")
    assert err < 1e-8   # far beyond single 28-bit-scale precision
print("OK")
