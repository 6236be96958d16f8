"""Serialized FHEW workflow with public-key encryption.

Ports of /root/reference src/binfhe/examples/pke/
boolean-serial-binary-pke.cpp and boolean-serial-json-pke.cpp: the
client serializes pk-encrypted ciphertexts; the server restores them,
evaluates a gate, and returns the serialized result.
"""
import os
import sys
import tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.binfhe.constants import BINGATE, KEYGEN_MODE
from openfhe_tpu.binfhe.context import BinFHEContext
from openfhe_tpu.utils.serialization import (SerType, serialize_to_file,
                                             deserialize_from_file)

cc = BinFHEContext()
cc.GenerateBinFHEContext("TOY")
sk = cc.KeyGen()
cc.BTKeyGen(sk, keygen_mode=KEYGEN_MODE.PUB_ENCRYPT)
pk = cc.GetPublicKey()

ct1 = cc.Encrypt(pk, 1)
ct2 = cc.Encrypt(pk, 0)

with tempfile.TemporaryDirectory() as d:
    for st, name in ((SerType.BINARY, "bin"), (SerType.JSON, "json")):
        serialize_to_file(os.path.join(d, f"sk.{name}"), sk, st)
        serialize_to_file(os.path.join(d, f"ct1.{name}"), ct1, st)
        serialize_to_file(os.path.join(d, f"ct2.{name}"), ct2, st)
        sk2 = deserialize_from_file(os.path.join(d, f"sk.{name}"), st)
        c1 = deserialize_from_file(os.path.join(d, f"ct1.{name}"), st)
        c2 = deserialize_from_file(os.path.join(d, f"ct2.{name}"), st)
        out = cc.EvalBinGate(BINGATE.OR, c1, c2)
        got = int(np.asarray(cc.Decrypt(sk2, out)))
        print(f"{name}: OR(1,0) = {got}")
        assert got == 1
print("OK")
