"""Multi-input boolean gates (3/4-input AND/OR, MAJORITY, CMUX).

Port of /root/reference src/binfhe/examples/boolean-multi-input.cpp.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.binfhe.constants import BINGATE
from openfhe_tpu.binfhe.context import BinFHEContext

cc = BinFHEContext()
cc.GenerateBinFHEContext("TOY")
sk = cc.KeyGen()
cc.BTKeyGen(sk)

bits = [1, 1, 0]
cts = [cc.Encrypt(sk, b, p=6) for b in bits]
and3 = cc.EvalBinGate(BINGATE.AND3, cts)
or3 = cc.EvalBinGate(BINGATE.OR3, cts)
maj = cc.EvalBinGate(BINGATE.MAJORITY, [cc.Encrypt(sk, b) for b in bits])
print("AND3:", int(np.asarray(cc.Decrypt(sk, and3))))
print("OR3 :", int(np.asarray(cc.Decrypt(sk, or3))))
print("MAJ :", int(np.asarray(cc.Decrypt(sk, maj))))
assert int(np.asarray(cc.Decrypt(sk, and3))) == 0
assert int(np.asarray(cc.Decrypt(sk, or3))) == 1
assert int(np.asarray(cc.Decrypt(sk, maj))) == 1

sel = cc.Encrypt(sk, 1)
c0 = cc.Encrypt(sk, 0)
c1 = cc.Encrypt(sk, 1)
mux = cc.EvalBinGate(BINGATE.CMUX, [c0, c1, sel])
print("CMUX(sel=1):", int(np.asarray(cc.Decrypt(sk, mux))))
assert int(np.asarray(cc.Decrypt(sk, mux))) == 1
print("OK")
