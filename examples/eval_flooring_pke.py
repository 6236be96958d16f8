"""Homomorphic flooring over a public-key encrypted input.

Port of /root/reference src/binfhe/examples/pke/eval-flooring-pke.cpp.
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
    n=64, N=1024, q=1024, q_bits=27, base_ks=25, base_g=512)
sk = cc.KeyGen()
print("generating bootstrapping keys...")
cc.BTKeyGen(sk, keygen_mode=KEYGEN_MODE.PUB_ENCRYPT)
pk = cc.GetPublicKey()

p_large = 16
q_large = cc.q * (p_large // 4)
bits = 2
m = 13
# pk encryption lands at (N, Q) and is switched to (n, q_large)
ct = cc.Encrypt(pk, m, p=p_large, q=q_large)
fl = cc.EvalFloor(ct, bits)
got = int(np.asarray(cc.Decrypt(sk, fl, p=p_large >> bits)))
print(f"floor({m} >> {bits}) = {got} (expected {m >> bits})")
assert got == m >> bits
print("OK")
