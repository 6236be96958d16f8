"""HRA-secure proxy re-encryption (fixed-noise + flooding modes).

Port of /root/reference src/pke/examples/pre-hra-secure.cpp: ReEncrypt
with the honest-re-encryption-attack hardening modes and a multi-hop
chain alice -> bob -> charlie.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature,
                                       ProxyReEncryptionMode, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams

for mode in (ProxyReEncryptionMode.FIXED_NOISE_HRA,
             ProxyReEncryptionMode.NOISE_FLOODING_HRA):
    params = CCParams(scheme=Scheme.BGVRNS_SCHEME, plaintext_modulus=12289,
                      mult_depth=2, ring_dim=1 << 10,
                      security_level=SecurityLevel.HEStd_NotSet,
                      pre_mode=mode)
    cc = GenCryptoContext(params, seed=5)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.PRE):
        cc.Enable(f)
    alice, bob, charlie = cc.KeyGen(), cc.KeyGen(), cc.KeyGen()
    v = np.array([1, 2, 3, 5, 8, 13])
    ct = cc.Encrypt(alice.public_key, cc.MakePackedPlaintext(v))
    rk_ab = cc.ReKeyGen(alice.secret_key, bob.public_key)
    rk_bc = cc.ReKeyGen(bob.secret_key, charlie.public_key)
    ct_b = cc.ReEncrypt(ct, rk_ab, bob.public_key)
    ct_c = cc.ReEncrypt(ct_b, rk_bc, charlie.public_key)
    got = cc.Decrypt(charlie.secret_key, ct_c).values[:6]
    print(f"{mode.name}: two-hop decrypt {np.asarray(got)} "
          f"exact={np.array_equal(got, v)}")
    assert np.array_equal(got, v)
print("OK")
