"""Serialized BFV workflow (client/server split).

Ports of /root/reference src/pke/examples/simple-integers-serial.cpp and
simple-integers-serial-bgvrns.cpp: the client serializes keys and inputs,
the server computes on deserialized objects, the client decrypts.
"""
import os
import sys
import tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.utils.serialization import (serialize_to_file,
                                             deserialize_from_file)

T = 12289
for scheme in (Scheme.BFVRNS_SCHEME, Scheme.BGVRNS_SCHEME):
    params = CCParams(scheme=scheme, plaintext_modulus=T, mult_depth=2,
                      ring_dim=1 << 10,
                      security_level=SecurityLevel.HEStd_NotSet)
    cc = GenCryptoContext(params, seed=15)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    keys = cc.KeyGen()
    cc.EvalMultKeyGen(keys.secret_key)
    v1 = np.array([1, 2, 3, 4, 5, 6], dtype=np.int64)
    v2 = np.array([7, 8, 9, 10, 11, 12], dtype=np.int64)
    c1 = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(v1))
    c2 = cc.Encrypt(keys.public_key, cc.MakePackedPlaintext(v2))
    with tempfile.TemporaryDirectory() as d:
        serialize_to_file(os.path.join(d, "c1"), c1)
        serialize_to_file(os.path.join(d, "c2"), c2)
        # "server": restore and evaluate
        s1 = deserialize_from_file(os.path.join(d, "c1"))
        s2 = deserialize_from_file(os.path.join(d, "c2"))
        prod = cc.EvalMult(s1, s2)
        serialize_to_file(os.path.join(d, "out"), prod)
        # "client": restore and decrypt
        out = deserialize_from_file(os.path.join(d, "out"))
        got = np.asarray(cc.Decrypt(keys.secret_key, out).values[:6]) % T
        print(f"{scheme.value}: {got} exact="
              f"{np.array_equal(got, (v1 * v2) % T)}")
        assert np.array_equal(got, (v1 * v2) % T)
print("OK")
