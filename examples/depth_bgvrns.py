"""Depth-3 BGV computation across scaling techniques.

Port of /root/reference src/pke/examples/depth-bgvrns.cpp: the same
(a*b*c)+(a*b) program under FIXEDAUTO and FLEXIBLEAUTO modulus reduction.
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

T = 12289
for tech in (ScalingTechnique.FIXEDAUTO, ScalingTechnique.FLEXIBLEAUTO):
    params = CCParams(scheme=Scheme.BGVRNS_SCHEME, plaintext_modulus=T,
                      mult_depth=3, ring_dim=1 << 10,
                      security_level=SecurityLevel.HEStd_NotSet,
                      scaling_technique=tech)
    cc = GenCryptoContext(params, seed=7)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    keys = cc.KeyGen()
    cc.EvalMultKeyGen(keys.secret_key)
    a = np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.int64)
    b = np.array([8, 7, 6, 5, 4, 3, 2, 1], dtype=np.int64)
    c = np.array([2, 2, 3, 3, 4, 4, 5, 5], dtype=np.int64)
    ca = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(a))
    cb = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(b))
    ctc = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(c))
    out = cc.EvalAdd(cc.EvalMult(cc.EvalMult(ca, cb), ctc),
                     cc.EvalMult(ca, cb))
    got = np.asarray(cc.Decrypt(keys.secret_key, out).values[:8]) % T
    want = (a * b * c + a * b) % T
    print(f"{tech.name}: exact={np.array_equal(got, want)}")
    assert np.array_equal(got, want)
print("OK")
