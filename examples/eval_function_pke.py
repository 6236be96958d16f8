"""Arbitrary function evaluation (LUT bootstrap) over pk-encrypted input.

Port of /root/reference src/binfhe/examples/pke/eval-function-pke.cpp:
evaluate f(x) = x^3 mod p via GenerateLUTviaFunction + EvalFunc on
ciphertexts produced with the public key stored by BTKeyGen(PUB_ENCRYPT).
Arbitrary functions need ciphertext modulus q = N (binfhecontext.cpp:93,
q = arbFunc ? ringDim : 2*ringDim), which gives p = q/(2*beta) = 8.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.binfhe.constants import KEYGEN_MODE
from openfhe_tpu.binfhe.context import BinFHEContext

cc = BinFHEContext().GenerateBinFHEContextCustom(
    n=64, N=2048, q=2048, q_bits=27, base_ks=25, base_g=512)
sk = cc.KeyGen()
print("generating bootstrapping keys...")
cc.BTKeyGen(sk, keygen_mode=KEYGEN_MODE.PUB_ENCRYPT)
pk = cc.GetPublicKey()

p = cc.GetMaxPlaintextSpace()
assert p == 8
lut = cc.GenerateLUTviaFunction(lambda x, pp: (x * x * x) % pp, p)
print(f"evaluating x^3 mod {p}")
for i in range(p):
    ct = cc.Encrypt(pk, i, p=p)
    ct_cube = cc.EvalFunc(ct, lut)
    got = int(np.asarray(cc.Decrypt(sk, ct_cube, p=p)))
    print(f"  input {i}: expected {(i**3) % p}, evaluated {got}")
    assert got == (i ** 3) % p
print("OK")
