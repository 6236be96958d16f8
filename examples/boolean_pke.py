"""FHEW Boolean gates over PUBLIC-KEY encrypted ciphertexts.

Port of /root/reference src/binfhe/examples/pke/boolean-pke.cpp: LWE
public-key encryption at ring dimension (N, Q), key switching down to
(n, q) for gate evaluation (binfhecontext.cpp Encrypt pk overload).
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.binfhe.constants import BINGATE, KEYGEN_MODE
from openfhe_tpu.binfhe.context import BinFHEContext

cc = BinFHEContext().GenerateBinFHEContext("TOY")   # use STD128 on TPU

# public key encrypt/decrypt round trip without bootstrap (LARGE_DIM)
pk0, sk_n = cc.KeyGenPair()
ctp = cc.Encrypt(pk0, 1, output="LARGE_DIM")
got = int(np.asarray(cc.Decrypt(sk_n, ctp)))
print("pk-encrypted 1 decrypts to", got)
assert got == 1

# gate evaluation path: small secret + bootstrapping keys + stored pk
sk = cc.KeyGen()
print("generating bootstrapping keys...")
cc.BTKeyGen(sk, keygen_mode=KEYGEN_MODE.PUB_ENCRYPT)

pk = cc.GetPublicKey()
ct1 = cc.Encrypt(pk, 1)
ct2 = cc.Encrypt(pk, 1)
got = int(np.asarray(cc.Decrypt(sk, ct1)))
print("pk-encrypted (SMALL_DIM) 1 decrypts to", got)
assert got == 1

ct_and1 = cc.EvalBinGate(BINGATE.AND, ct1, ct2)
r1 = int(np.asarray(cc.Decrypt(sk, ct_and1)))
print("1 AND 1 =", r1)
assert r1 == 1

ct2_not = cc.EvalNOT(ct2)
ct_and2 = cc.EvalBinGate(BINGATE.AND, ct2_not, ct1)
r2 = int(np.asarray(cc.Decrypt(sk, ct_and2)))
print("(NOT 1) AND 1 =", r2)
assert r2 == 0

ct_or = cc.EvalBinGate(BINGATE.OR, ct_and1, ct_and2)
r3 = int(np.asarray(cc.Decrypt(sk, ct_or)))
print("(1 AND 1) OR ((NOT 1) AND 1) =", r3)
assert r3 == 1
print("OK")
