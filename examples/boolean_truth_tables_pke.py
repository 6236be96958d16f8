"""Full Boolean-gate truth tables over public-key encrypted inputs.

Port of /root/reference src/binfhe/examples/pke/boolean-truth-tables-pke.cpp
— every (a, b) input pair runs as one batched ciphertext (TPU layout).
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from openfhe_tpu.binfhe.constants import BINGATE, KEYGEN_MODE
from openfhe_tpu.binfhe.context import BinFHEContext

cc = BinFHEContext().GenerateBinFHEContext("TOY")
sk = cc.KeyGen()
print("generating bootstrapping keys...")
cc.BTKeyGen(sk, keygen_mode=KEYGEN_MODE.PUB_ENCRYPT)
pk = cc.GetPublicKey()

a = jnp.array([0, 0, 1, 1], jnp.uint32)
b = jnp.array([0, 1, 0, 1], jnp.uint32)
ct_a = cc.Encrypt(pk, a)
ct_b = cc.Encrypt(pk, b)

expected = {
    BINGATE.AND: [0, 0, 0, 1], BINGATE.OR: [0, 1, 1, 1],
    BINGATE.NAND: [1, 1, 1, 0], BINGATE.NOR: [1, 0, 0, 0],
    BINGATE.XOR: [0, 1, 1, 0], BINGATE.XNOR: [1, 0, 0, 1],
}
for gate, want in expected.items():
    out = cc.EvalBinGate(gate, ct_a, ct_b)
    got = [int(v) for v in np.asarray(cc.Decrypt(sk, out))]
    print(f"{gate.name}: {got}")
    assert got == want, (gate, got, want)
print("OK")
