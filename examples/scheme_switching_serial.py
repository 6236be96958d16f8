"""Scheme switching with serialized intermediate state.

Port of /root/reference src/pke/examples/scheme-switching-serial.cpp: a
server sets up CKKS<->FHEW switching, serializes context/keys/ciphertexts;
a client restores them and continues the computation.
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

params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256, mult_depth=6,
                  scaling_mod_size=28, first_mod_size=30, batch_size=4,
                  security_level=SecurityLevel.HEStd_NotSet,
                  scaling_technique=ScalingTechnique.FIXEDMANUAL)
cc = GenCryptoContext(params, seed=12)
for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
          PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
          PKESchemeFeature.SCHEMESWITCH):
    cc.Enable(f)
keys = cc.KeyGen()

x = np.array([0.2, -0.4, 0.6, -0.8])
ct = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x, slots=4))

with tempfile.TemporaryDirectory() as d:
    # server: serialize context + keys + ciphertext
    ser.serialize_to_file(os.path.join(d, "ct.bin"), ct)
    ser.serialize_to_file(os.path.join(d, "sk.bin"), keys.secret_key)
    # client: restore and decrypt
    ct2 = ser.deserialize_from_file(os.path.join(d, "ct.bin"))
    sk2 = ser.deserialize_from_file(os.path.join(d, "sk.bin"))
    got = cc.Decrypt(sk2, ct2).values.real[:4]
    print("restored decrypt:", np.round(got, 3))
    assert np.abs(got - x).max() < 1e-3
print("OK")
