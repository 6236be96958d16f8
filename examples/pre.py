"""Proxy re-encryption: re-target a ciphertext to another key.

Minimal PRE demo (see pre_buffer.py for the full port of
/root/reference src/pke/examples/pre-buffer.cpp).
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams

params = CCParams(scheme=Scheme.BGVRNS_SCHEME, plaintext_modulus=65537,
                  mult_depth=2, ring_dim=1 << 11,
                  security_level=SecurityLevel.HEStd_NotSet)
cc = GenCryptoContext(params)
cc.Enable(PKESchemeFeature.PKE)
cc.Enable(PKESchemeFeature.KEYSWITCH)
cc.Enable(PKESchemeFeature.LEVELEDSHE)
cc.Enable(PKESchemeFeature.PRE)

alice = cc.KeyGen()
bob = cc.KeyGen()

v = np.array([4, 8, 15, 16, 23, 42])
ct_alice = cc.Encrypt(alice.public_key, cc.MakePackedPlaintext(v))

# Alice authorizes Bob: re-encryption key from Alice's sk to Bob's pk
rk = cc.ReKeyGen(alice.secret_key, bob.public_key)
ct_bob = cc.ReEncrypt(ct_alice, rk)

got = cc.Decrypt(bob.secret_key, ct_bob).values[:6]
print("Bob decrypts:", got, "exact:", np.array_equal(got, v))
