"""FHEW/TFHE boolean gates with the DM/AP bootstrapping method.

Port of /root/reference src/binfhe/examples/boolean-ap.cpp: AND/OR/NAND
gates under the AP (base-decomposed digit key) accumulator.
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
cc.GenerateBinFHEContext("TOY", method="AP")
sk = cc.KeyGen()
cc.BTKeyGen(sk)

# all four input combinations at once (batched ciphertext tensors)
a = cc.Encrypt(sk, np.array([0, 0, 1, 1]))
b = cc.Encrypt(sk, np.array([0, 1, 0, 1]))
for gate, truth in ((BINGATE.AND, [0, 0, 0, 1]), (BINGATE.OR, [0, 1, 1, 1]),
                    (BINGATE.NAND, [1, 1, 1, 0])):
    out = cc.EvalBinGate(gate, a, b)
    got = [int(v) for v in np.asarray(cc.Decrypt(sk, out))]
    print(f"{gate.name}: {got}")
    assert got == truth
print("OK (AP method)")
