"""Parallel (mesh/sharding) + profiling + binfhe serialization tests.

Reference analog: parallel.h OpenFHEParallelControls semantics mapped onto
jax.sharding (SURVEY.md §2.5), Serial:: round-trips for binfhe objects
(binfhe-ser.h).
"""
import numpy as np

import jax

from openfhe_tpu.parallel import (OpenFHEParallelControls, replicate,
                                  shard_batch, shard_ciphertext)
from openfhe_tpu.utils import serialization as ser
from openfhe_tpu.utils.profiling import TIC, TOC, stage


def test_mesh_default_shape():
    mesh = OpenFHEParallelControls.get_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("dp", "limb")


def test_shard_batch_and_replicate():
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sx = shard_batch(x)
    assert np.allclose(np.asarray(sx), x)
    r = replicate(np.ones(3, np.float32))
    assert np.asarray(r).sum() == 3.0


def test_shard_ciphertext_preserves_values(ckks64):
    cc, kp = ckks64
    x = np.linspace(-1, 1, 8)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    sct = shard_ciphertext(ct)
    dec = cc.Decrypt(kp.secret_key, sct)
    assert np.abs(dec.values.real - x).max() < 1e-4


def test_profiling_helpers():
    t0 = TIC()
    with stage("unit-test"):
        pass
    assert TOC(t0) >= 0.0


def test_lwe_serialization_roundtrip():
    from openfhe_tpu.binfhe.context import BinFHEContext

    cc = BinFHEContext()
    cc.GenerateBinFHEContext("TOY", method="GINX")
    sk = cc.KeyGen()
    ct = cc.Encrypt(sk, 1)

    blob = ser.serialize(ct)
    ct2 = ser.deserialize(blob)
    assert cc.Decrypt(sk, ct2) == 1
    assert ct2.modulus == ct.modulus

    js = ser.serialize(sk, ser.SerType.JSON)
    sk2 = ser.deserialize(js, ser.SerType.JSON)
    assert np.array_equal(np.asarray(sk.s), np.asarray(sk2.s))


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def ckks64():
    from openfhe_tpu.pke.constants import (PKESchemeFeature,
                                           ScalingTechnique, Scheme,
                                           SecurityLevel)
    from openfhe_tpu.pke.context import GenCryptoContext
    from openfhe_tpu.pke.parameters import CCParams

    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=64, mult_depth=2,
                 scaling_mod_size=28, first_mod_size=30,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=7)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    kp = cc.KeyGen()
    return cc, kp


def test_ciphertext_metadata_map(ckks64):
    """Reference ciphertext.h m_metadataMap semantics."""
    cc, kp = ckks64
    ct = cc.Encrypt(kp.public_key,
                    cc.MakeCKKSPackedPlaintext(np.ones(8), slots=8))
    ct2 = ct.SetMetadataByKey("tag", {"owner": "alice"})
    assert ct2.FindMetadataByKey("tag")
    assert not ct.FindMetadataByKey("tag")         # original untouched
    assert ct2.GetMetadataByKey("tag")["owner"] == "alice"
    ct3 = ct2.SetMetadataByKey("tag", 7).Clone()
    assert ct3.GetMetadataByKey("tag") == 7
    assert len(ct3.GetMetadataMap()) == 1
    try:
        ct.GetMetadataByKey("missing")
        assert False
    except KeyError:
        pass
    # metadata survives homomorphic ops through replace()
    ct4 = cc.EvalAdd(ct2, ct2)
    assert ct4.FindMetadataByKey("tag")
