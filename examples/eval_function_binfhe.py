"""Arbitrary function evaluation over Z_p via FHEW functional bootstrapping.

Port of /root/reference src/binfhe/examples/eval-function.cpp.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from openfhe_tpu.binfhe.context import BinFHEContext

cc = BinFHEContext().GenerateBinFHEContextCustom(
    n=64, N=1024, q=1024, q_bits=27, base_ks=25, base_g=512)
sk = cc.KeyGen()
print("generating bootstrapping keys...")
cc.BTKeyGen(sk)

p = 4
lut = cc.GenerateLUTviaFunction(lambda m, pp: (m * m) % pp, p)
msgs = jnp.arange(p, dtype=jnp.uint32)
ct = cc.Encrypt(sk, msgs, p=p)
out = cc.EvalFunc(ct, lut)
print("f(x) = x^2 mod 4:", cc.Decrypt(sk, out, p=p),
      "expected:", (np.arange(p) ** 2) % p)
