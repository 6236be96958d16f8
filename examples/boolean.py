"""FHEW/TFHE Boolean gates with gate bootstrapping.

Port of /root/reference src/binfhe/examples/boolean.cpp — all four input
combinations evaluated as one batched ciphertext (the TPU-native layout).
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from openfhe_tpu.binfhe.constants import BINGATE
from openfhe_tpu.binfhe.context import BinFHEContext

cc = BinFHEContext().GenerateBinFHEContext("TOY")   # use STD128 on TPU
sk = cc.KeyGen()
print("generating bootstrapping keys...")
cc.BTKeyGen(sk)

m1 = jnp.array([0, 0, 1, 1], jnp.uint32)
m2 = jnp.array([0, 1, 0, 1], jnp.uint32)
ct1 = cc.Encrypt(sk, m1)
ct2 = cc.Encrypt(sk, m2)

for gate in (BINGATE.AND, BINGATE.OR, BINGATE.NAND, BINGATE.XOR):
    res = cc.EvalBinGate(gate, ct1, ct2)
    print(f"{gate.name}(m1, m2) =", cc.Decrypt(sk, res))
print("NOT(m1) =", cc.Decrypt(sk, cc.EvalNOT(ct1)))
