"""Proxy re-encryption of a full packed integer buffer (BFV).

Port of /root/reference src/pke/examples/pre-buffer.cpp:63-238: Alice
encrypts a ring-dimension-sized buffer of shorts under BFV, generates a
re-encryption key to Bob (INDCPA PRE mode), the proxy re-encrypts, and
both decryptions are verified element-for-element, with the reference's
TIC/TOC stage timings.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import math
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature,
                                       ProxyReEncryptionMode, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.utils.profiling import TIC, TOC_MS

t_mod = 65537            # "can encode shorts"

print("setting up BFV RNS crypto system")
t = TIC()
params = CCParams(scheme=Scheme.BFVRNS_SCHEME, plaintext_modulus=t_mod,
                  mult_depth=1, ring_dim=1 << 12,
                  pre_mode=ProxyReEncryptionMode.INDCPA,
                  security_level=SecurityLevel.HEStd_NotSet)
cc = GenCryptoContext(params)
print(f"\nParam generation time: \t{TOC_MS(t):.2f} ms")
cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
          | PKESchemeFeature.LEVELEDSHE | PKESchemeFeature.PRE)

ringsize = cc.ring_dim
print("p =", t_mod)
print("n =", ringsize)
print("log2 q =", round(sum(math.log2(q) for q in cc.moduli_q), 1))
print(f"Alice can encrypt {ringsize * 2} bytes of data")

print("\nRunning Alice key generation (used for source data)...")
t = TIC()
kp1 = cc.KeyGen()
print(f"Key generation time: \t{TOC_MS(t):.2f} ms")

rng = np.random.default_rng(42)
v_shorts = rng.integers(0, 65536, size=ringsize)
pt = cc.MakePackedPlaintext(v_shorts)

t = TIC()
ct1 = cc.Encrypt(kp1.public_key, pt)
print(f"Encryption time: \t{TOC_MS(t, ct1.elements[0]):.2f} ms")

t = TIC()
dec1 = cc.Decrypt(kp1.secret_key, ct1)
print(f"Decryption time: \t{TOC_MS(t):.2f} ms")

print("Bob Running key generation ...")
t = TIC()
kp2 = cc.KeyGen()
print(f"Key generation time: \t{TOC_MS(t):.2f} ms")

print("\nGenerating proxy re-encryption key...")
t = TIC()
rk12 = cc.ReKeyGen(kp1.secret_key, kp2.public_key)
print(f"Key generation time: \t{TOC_MS(t):.2f} ms")

t = TIC()
ct2 = cc.ReEncrypt(ct1, rk12)
print(f"Re-Encryption time: \t{TOC_MS(t, ct2.elements[0]):.2f} ms")

t = TIC()
dec2 = cc.Decrypt(kp2.secret_key, ct2)
print(f"Decryption time: \t{TOC_MS(t):.2f} ms")

# plaintexts decode centered in (-p/2, p/2]; shift back to 0..p-1
u1 = np.where(dec1.values[:ringsize] < 0,
              dec1.values[:ringsize] + t_mod, dec1.values[:ringsize])
u2 = np.where(dec2.values[:ringsize] < 0,
              dec2.values[:ringsize] + t_mod, dec2.values[:ringsize])
good = np.array_equal(u1, v_shorts) and np.array_equal(u2, v_shorts)
print("PRE passes" if good else "PRE fails")
print("Execution Completed.")
sys.exit(0 if good else 1)
