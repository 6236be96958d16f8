"""CKKS with full serialization between every step (checkpoint/resume).

Port of /root/reference src/pke/examples/simple-real-numbers-serial.cpp:
context, keys, and ciphertexts round-trip through files between the
"client" and "server" phases.
"""
import os
import sys
import tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.utils import serialization as ser


def main():
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=3,
                 scaling_mod_size=28, first_mod_size=30, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=9)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)

    d = tempfile.mkdtemp()
    x = np.linspace(-1, 1, 8)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))

    # client writes everything out (binary like SERBINARY)
    ser.serialize_to_file(f"{d}/context.bin", cc)
    ser.serialize_to_file(f"{d}/pub.bin", kp.public_key)
    ser.serialize_to_file(f"{d}/sec.bin", kp.secret_key)
    ser.serialize_to_file(f"{d}/ct.bin", ct)
    mult_keys = ser.serialize_eval_mult_keys(cc)
    with open(f"{d}/multkeys.json", "w") as f:
        f.write(mult_keys)

    # server: fresh deserialization (context dedups through the factory)
    cc2 = ser.deserialize_from_file(f"{d}/context.bin")
    cc2.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
               | PKESchemeFeature.LEVELEDSHE)
    with open(f"{d}/multkeys.json") as f:
        ser.deserialize_eval_mult_keys(cc2, f.read())
    ct_in = ser.deserialize_from_file(f"{d}/ct.bin")
    out = cc2.EvalMult(ct_in, ct_in)
    ser.serialize_to_file(f"{d}/result.bin", out)

    # client reads the result back
    sk = ser.deserialize_from_file(f"{d}/sec.bin")
    res = ser.deserialize_from_file(f"{d}/result.bin")
    got = cc2.Decrypt(sk, res).values.real
    print("x^2      =", np.round(got, 4))
    print("expected =", np.round(x * x, 4))
    assert np.abs(got - x * x).max() < 1e-2
    print("serialized CKKS workflow OK")


if __name__ == "__main__":
    main()
