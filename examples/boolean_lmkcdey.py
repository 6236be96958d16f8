"""FHEW/TFHE boolean gates with the LMKCDEY bootstrapping method.

Port of /root/reference src/binfhe/examples/boolean-lmkcdey.cpp:
automorphism-ladder blind rotation.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.binfhe.constants import BINFHE_METHOD, BINGATE
from openfhe_tpu.binfhe.context import BinFHEContext

cc = BinFHEContext().GenerateBinFHEContextCustom(
    n=64, N=1024, q=2048, q_bits=27, base_ks=25, base_g=128,
    method=BINFHE_METHOD.LMKCDEY, num_auto_keys=10)
sk = cc.KeyGen()
cc.BTKeyGen(sk)

a = cc.Encrypt(sk, np.array([0, 0, 1, 1]))
b = cc.Encrypt(sk, np.array([0, 1, 0, 1]))
out = cc.EvalBinGate(BINGATE.AND, a, b)
got = [int(v) for v in np.asarray(cc.Decrypt(sk, out))]
print("AND:", got)
assert got == [0, 0, 0, 1]
out = cc.EvalBinGate(BINGATE.XOR, a, b)
got = [int(v) for v in np.asarray(cc.Decrypt(sk, out))]
print("XOR:", got)
assert got == [0, 1, 1, 0]
print("OK (LMKCDEY method)")
