"""Large-precision sign / floor / digit decomposition over FHEW.

Ports of /root/reference src/binfhe/examples/eval-sign.cpp,
eval-flooring.cpp, eval-decomp.cpp: homomorphic sign extraction,
round-and-floor, and base-p digit decomposition of larger-precision LWE
ciphertexts via iterated functional bootstraps
(binfhe-base-scheme.cpp:261-484).
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.binfhe.context import BinFHEContext

cc = BinFHEContext().GenerateBinFHEContextCustom(
    n=64, N=1024, q=1024, q_bits=27, base_ks=25, base_g=512)
sk = cc.KeyGen()
cc.BTKeyGen(sk)

p_large = 16
q_large = cc.q * (p_large // 4)

# EvalSign: msb of values around q/2
for m in (2, 13):
    ct = cc.Encrypt(sk, m, p=p_large, q=q_large)
    s = cc.EvalSign(ct)
    got = int(np.asarray(cc.Decrypt(sk, s, p=2)))
    print(f"sign({m} of {p_large}) -> {got}")
    assert got == (1 if m >= p_large // 2 else 0)

# EvalFloor: drop the lowest bits
m = 13
ct = cc.Encrypt(sk, m, p=p_large, q=q_large)
fl = cc.EvalFloor(ct, 2)
got = int(np.asarray(cc.Decrypt(sk, fl, p=p_large >> 2)))
print(f"floor({m} >> 2) -> {got}")
assert got == m >> 2

# EvalDecomp: base-4 digits
m = 11
ct = cc.Encrypt(sk, m, p=p_large, q=q_large)
digits = cc.EvalDecomp(ct)
vals = [int(np.asarray(cc.Decrypt(sk, d, p=4))) for d in digits]
rec = sum(v * (4 ** i) for i, v in enumerate(vals))
print(f"decomp({m}) -> digits {vals} -> {rec}")
assert rec == m
print("OK")
