"""Depth-3 BFV computation with EXTENDED encryption option.

Port of /root/reference src/pke/examples/depth-bfvrns.cpp (and the BEHZ
variant depth-bfvrns-behz.cpp — the multiplication-technique enum selects
the same integer-exact TPU path here, see pke/schemes/bfv.py):
(a*b*c) + (a*b) computed homomorphically, exact mod t.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.pke.constants import (EncryptionTechnique,
                                       MultiplicationTechnique,
                                       PKESchemeFeature, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams

T = 12289
for mult_tech, enc_tech in (
        (MultiplicationTechnique.HPSPOVERQLEVELED,
         EncryptionTechnique.STANDARD),
        (MultiplicationTechnique.BEHZ, EncryptionTechnique.EXTENDED)):
    params = CCParams(scheme=Scheme.BFVRNS_SCHEME, plaintext_modulus=T,
                      mult_depth=3, ring_dim=1 << 10,
                      security_level=SecurityLevel.HEStd_NotSet,
                      multiplication_technique=mult_tech,
                      encryption_technique=enc_tech)
    cc = GenCryptoContext(params, seed=6)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    keys = cc.KeyGen()
    cc.EvalMultKeyGen(keys.secret_key)
    a = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int64)
    b = np.array([2, 7, 1, 8, 2, 8, 1, 8], dtype=np.int64)
    c = np.array([1, 6, 1, 8, 0, 3, 3, 9], dtype=np.int64)
    ca = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(a))
    cb = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(b))
    ctc = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(c))
    ab = cc.EvalMult(ca, cb)
    abc = cc.EvalMult(ab, ctc)
    out = cc.EvalAdd(abc, ab)
    got = np.asarray(cc.Decrypt(keys.secret_key, out).values[:8]) % T
    want = (a * b * c + a * b) % T
    print(f"{mult_tech.name}/{enc_tech.name}: exact="
          f"{np.array_equal(got, want)}")
    assert np.array_equal(got, want)
print("OK")
