"""Full truth tables for the two-input gate set.

Port of /root/reference src/binfhe/examples/boolean-truth-tables.cpp:
every gate evaluated on all four input combinations in one batch.
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

a = cc.Encrypt(sk, np.array([0, 0, 1, 1]))
b = cc.Encrypt(sk, np.array([0, 1, 0, 1]))
tables = {
    BINGATE.AND: [0, 0, 0, 1], BINGATE.OR: [0, 1, 1, 1],
    BINGATE.NAND: [1, 1, 1, 0], BINGATE.NOR: [1, 0, 0, 0],
    BINGATE.XOR: [0, 1, 1, 0], BINGATE.XNOR: [1, 0, 0, 1],
}
print("a b |", "  ".join(g.name for g in tables))
for gate, truth in tables.items():
    out = cc.EvalBinGate(gate, a, b)
    got = [int(v) for v in np.asarray(cc.Decrypt(sk, out))]
    print(f"{gate.name:5s} {got}")
    assert got == truth, (gate, got, truth)
nt = cc.EvalNOT(a)
assert [int(v) for v in np.asarray(cc.Decrypt(sk, nt))] == [1, 1, 0, 0]
print("OK")
