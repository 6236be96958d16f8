"""Serialization round-trips, PRE hops, threshold multiparty protocol.

Reference analog: UnitTestSer.h / UnitTestCKKSrnsSerialize.cpp,
UnitTestPRE.cpp, UnitTestMultiparty.cpp — parties simulated sequentially in
one process (SURVEY.md §4).
"""
import numpy as np
import pytest

from openfhe_tpu.pke.constants import (MultipartyMode, PKESchemeFeature,
                                       ProxyReEncryptionMode,
                                       ScalingTechnique, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.utils import serialization as ser


@pytest.fixture(scope="module")
def ckks():
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256, mult_depth=3,
                 scaling_mod_size=28, first_mod_size=30, batch_size=128,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=3)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE | PKESchemeFeature.PRE
              | PKESchemeFeature.MULTIPARTY)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    return cc, kp


def test_serialize_roundtrip_binary_json(ckks):
    cc, kp = ckks
    x = np.linspace(0, 1, cc.slots)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x))
    for st in (ser.SerType.BINARY, ser.SerType.JSON):
        data = ser.serialize(ct, st)
        ct2 = ser.deserialize(data, st)
        dec = cc.Decrypt(kp.secret_key, ct2)
        assert np.abs(dec.values.real - x).max() < 1e-4
    # keys round-trip
    for obj in (kp.public_key, kp.secret_key,
                cc.eval_mult_keys[kp.secret_key.key_tag]):
        data = ser.serialize(obj)
        obj2 = ser.deserialize(data)
        assert obj2.key_tag == obj.key_tag
    # eval key maps
    blob = ser.serialize_eval_mult_keys(cc)
    cc.eval_mult_keys.clear()
    ser.deserialize_eval_mult_keys(cc, blob)
    assert kp.secret_key.key_tag in cc.eval_mult_keys


def test_context_factory_dedup(ckks):
    cc, _ = ckks
    blob = ser.serialize_context(cc)
    c1 = ser.deserialize_context(blob)
    c2 = ser.deserialize_context(blob)
    assert c1 is c2


def test_pre_hop(ckks):
    cc, alice = ckks
    bob = cc.KeyGen()
    x = np.linspace(-1, 1, cc.slots)
    ct = cc.Encrypt(alice.public_key, cc.MakeCKKSPackedPlaintext(x))
    # secret-key based rekey
    rk = cc.ReKeyGen(alice.secret_key, bob.secret_key)
    ct_bob = cc.ReEncrypt(ct, rk)
    dec = cc.Decrypt(bob.secret_key, ct_bob)
    assert np.abs(dec.values.real - x).max() < 1e-3
    # public-key based rekey (unidirectional PRE)
    rk2 = cc.ReKeyGen(alice.secret_key, bob.public_key)
    ct_bob2 = cc.ReEncrypt(ct, rk2, bob.public_key)
    dec2 = cc.Decrypt(bob.secret_key, ct_bob2)
    assert np.abs(dec2.values.real - x).max() < 1e-3


def test_threshold_multiparty_e2e(ckks):
    cc, _ = ckks
    # 3-party round-robin keygen
    kp1 = cc.MultipartyKeyGen()
    kp2 = cc.MultipartyKeyGen(kp1.public_key)
    kp3 = cc.MultipartyKeyGen(kp2.public_key)
    joint_pk = kp3.public_key

    x = np.linspace(0, 1, cc.slots)
    y = np.linspace(1, 2, cc.slots)
    cx = cc.Encrypt(joint_pk, cc.MakeCKKSPackedPlaintext(x))
    cy = cc.Encrypt(joint_pk, cc.MakeCKKSPackedPlaintext(y))
    csum = cc.EvalAdd(cx, cy)

    # distributed decryption
    p1 = cc.MultipartyDecryptLead(csum, kp1.secret_key)
    p2 = cc.MultipartyDecryptMain(csum, kp2.secret_key)
    p3 = cc.MultipartyDecryptMain(csum, kp3.secret_key)
    pt = cc.MultipartyDecryptFusion([p1, p2, p3], csum)
    assert np.abs(pt.values.real - (x + y)).max() < 1e-3


def test_multiparty_joint_relin_key(ckks):
    cc, _ = ckks
    # 2-party joint relinearization key protocol (threshold-fhe.cpp flow)
    kp1 = cc.MultipartyKeyGen()
    kp2 = cc.MultipartyKeyGen(kp1.public_key)
    joint_pk = kp2.public_key
    tag = joint_pk.key_tag

    # round 1: party 1 generates ek share for s1 (standard keygen)
    ek1 = cc.KeySwitchGen(kp1.secret_key, kp1.secret_key)
    # party 2 adds its share reusing common a
    ek2 = cc.MultiKeySwitchGen(kp2.secret_key, kp2.secret_key, ek1)
    ek12 = cc.MultiAddEvalKeys(ek1, ek2, tag)
    # round 2: each party multiplies by its share
    ek1m = cc.MultiMultEvalKey(ek12, kp1.secret_key, tag)
    ek2m = cc.MultiMultEvalKey(ek12, kp2.secret_key, tag)
    ek_joint = cc.MultiAddEvalMultKeys(ek1m, ek2m, tag)
    cc.InsertEvalMultKey(ek_joint, tag)

    x = np.linspace(0.1, 0.9, cc.slots)
    cx = cc.Encrypt(joint_pk, cc.MakeCKKSPackedPlaintext(x))
    cm = cc.EvalMult(cx, cx)
    p1 = cc.MultipartyDecryptLead(cm, kp1.secret_key)
    p2 = cc.MultipartyDecryptMain(cm, kp2.secret_key)
    pt = cc.MultipartyDecryptFusion([p1, p2], cm)
    assert np.abs(pt.values.real - x * x).max() < 5e-2


def test_shamir_share_recover(ckks):
    cc, kp = ckks
    shares = cc.ShareKeys(kp.secret_key, num_parties=5, threshold=3)
    rec = cc.RecoverSharedKey({i: shares[i] for i in (1, 3, 5)},
                              key_tag=kp.secret_key.key_tag)
    x = np.linspace(0, 1, cc.slots)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x))
    dec = cc.Decrypt(rec, ct)
    assert np.abs(dec.values.real - x).max() < 1e-4


def test_noise_flooding_multiparty_bfv_extra_limb():
    """NOISE_FLOODING_MULTIPARTY for BFV: parameter generation adds ~128
    bits of modulus headroom and decryption shares carry a uniform
    extra-limb mask over Q/q0 (Threshold_FHE.md:28-40). Threshold decrypt
    must stay exact."""
    from openfhe_tpu.pke import multiparty as mp
    from openfhe_tpu.pke.constants import (MultipartyMode, PKESchemeFeature,
                                           Scheme, SecurityLevel)
    from openfhe_tpu.pke.context import GenCryptoContext
    from openfhe_tpu.pke.parameters import CCParams

    def build(mode):
        p = CCParams(scheme=Scheme.BFVRNS_SCHEME, ring_dim=512,
                     mult_depth=1, plaintext_modulus=12289,
                     scaling_mod_size=28,
                     security_level=SecurityLevel.HEStd_NotSet,
                     multiparty_mode=mode)
        cc = GenCryptoContext(p, seed=31)
        cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
                  | PKESchemeFeature.LEVELEDSHE
                  | PKESchemeFeature.MULTIPARTY)
        return cc

    cc_fix = build(MultipartyMode.FIXED_NOISE_MULTIPARTY)
    cc = build(MultipartyMode.NOISE_FLOODING_MULTIPARTY)
    # flooding mode must carry the extra ~128-bit headroom
    assert len(cc.moduli_q) >= len(cc_fix.moduli_q) + 4

    kp1 = cc.KeyGen()
    kp2 = cc.MultipartyKeyGen(kp1.public_key)
    v = np.arange(12, dtype=np.int64) + 1
    ct = cc.Encrypt(kp2.public_key, cc.MakePackedPlaintext(v))
    lead = cc.MultipartyDecryptLead([ct], kp1.secret_key)[0]
    main = cc.MultipartyDecryptMain([ct], kp2.secret_key)[0]
    out = cc.MultipartyDecryptFusion([lead, main], ct)
    assert np.asarray(out.values[:12]).tolist() == v.tolist()
