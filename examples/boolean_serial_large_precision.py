"""Serialized large-precision FHEW workflow (binary AND json).

Ports of /root/reference
src/binfhe/examples/boolean-serial-binary-dynamic-large-precision.cpp and
boolean-serial-json-dynamic-large-precision.cpp: generate a
large-precision (logQ > gate default) context, serialize the secret key,
the bootstrapping keys (refresh + key-switch), and a large-precision
ciphertext; restore everything on the "server" side and run an
EvalFloor there, decrypting with the restored key.
"""
import os
import sys
import tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.binfhe.context import BinFHEContext
from openfhe_tpu.utils.serialization import (SerType, serialize_to_file,
                                             deserialize_from_file)


def fresh_cc():
    # TOY-class lattice with a 17-bit ciphertext modulus for large
    # plaintext precision (reference: GenerateBinFHEContext(TOY, false,
    # logQ=17, 0, GINX, true))
    return BinFHEContext().GenerateBinFHEContextCustom(
        n=64, N=1024, q=1024, q_bits=27, base_ks=25, base_g=512)


cc1 = fresh_cc()
sk1 = cc1.KeyGen()
cc1.BTKeyGen(sk1)

p_large = 16                        # plaintext space beyond the gate default
q_large = cc1.q * (p_large // 4)
m = 13
ct1 = cc1.Encrypt(sk1, m, p=p_large, q=q_large)

for st, name in ((SerType.BINARY, "bin"), (SerType.JSON, "json")):
    with tempfile.TemporaryDirectory() as d:
        serialize_to_file(os.path.join(d, f"sk.{name}"), sk1, st)
        serialize_to_file(os.path.join(d, f"ksKey.{name}"), cc1.ks_key, st)
        serialize_to_file(os.path.join(d, f"refreshKey.{name}"),
                          cc1.bt_key, st)
        serialize_to_file(os.path.join(d, f"ct.{name}"), ct1, st)
        print(f"[{name}] keys + ciphertext serialized "
              f"({sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))} bytes)")

        # --- "server" side: fresh context, restored keys ---
        cc2 = fresh_cc()
        sk2 = deserialize_from_file(os.path.join(d, f"sk.{name}"), st)
        cc2.ks_key = deserialize_from_file(os.path.join(d, f"ksKey.{name}"),
                                           st)
        cc2.bt_key = deserialize_from_file(
            os.path.join(d, f"refreshKey.{name}"), st)
        ct = deserialize_from_file(os.path.join(d, f"ct.{name}"), st)

        fl = cc2.EvalFloor(ct, 2)
        got = int(np.asarray(cc2.Decrypt(sk2, fl, p=p_large >> 2)))
        print(f"[{name}] floor({m} >> 2) on restored keys -> {got}")
        assert got == m >> 2
print("boolean-serial large-precision: OK")
