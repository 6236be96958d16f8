"""FHEW Boolean gates, AP/DM bootstrapping, public-key encryption.

Port of /root/reference src/binfhe/examples/pke/boolean-ap-pke.cpp.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.binfhe.constants import BINGATE, KEYGEN_MODE
from openfhe_tpu.binfhe.context import BinFHEContext

cc = BinFHEContext().GenerateBinFHEContext("TOY", method="AP")
sk = cc.KeyGen()
print("generating bootstrapping keys (AP)...")
cc.BTKeyGen(sk, keygen_mode=KEYGEN_MODE.PUB_ENCRYPT)
pk = cc.GetPublicKey()

ct1 = cc.Encrypt(pk, 1)
ct2 = cc.Encrypt(pk, 1)

ct_and = cc.EvalBinGate(BINGATE.AND, ct1, ct2)
r = int(np.asarray(cc.Decrypt(sk, ct_and)))
print("1 AND 1 =", r)
assert r == 1

ct_nand = cc.EvalBinGate(BINGATE.NAND, ct1, ct2)
r = int(np.asarray(cc.Decrypt(sk, ct_nand)))
print("1 NAND 1 =", r)
assert r == 0
print("OK")
