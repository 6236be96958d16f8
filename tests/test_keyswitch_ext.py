"""Generic KeySwitch + extended-basis (QP) hoisting API
(reference: KeySwitch/KeySwitchExt/KeySwitchDown/EvalFastRotationExt,
cryptocontext.h:1680-2440; keyswitch-hybrid.cpp EvalFastKeySwitchCoreExt)
and assorted keygen/multiparty API parity (SparseKeyGen, MultiAddPubKeys,
MakePlaintext)."""
import jax.numpy as jnp
import numpy as np
import pytest

from openfhe_tpu.math import modops as mo
from openfhe_tpu.pke.constants import (PKESchemeFeature, PlaintextEncodings,
                                       ScalingTechnique, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.keys import PrivateKey, PublicKey
from openfhe_tpu.pke.parameters import CCParams


@pytest.fixture(scope="module")
def ckks():
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=4,
                 scaling_mod_size=28, first_mod_size=30, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=11)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    return cc, kp


def test_generic_keyswitch_to_new_key(ckks):
    cc, kp = ckks
    kp2 = cc.KeyGen()
    ek = cc.KeySwitchGen(kp.secret_key, kp2.secret_key)
    x = np.linspace(-1, 1, 8)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    swt = cc.KeySwitch(ct, ek)
    dec = cc.Decrypt(kp2.secret_key, swt).values.real
    assert np.abs(dec - x).max() < 1e-3


def test_ext_rotation_accumulation(ckks):
    """sum_r rot_r(ct) via EvalFastRotationExt + EvalAddExt + one
    KeySwitchDown == the same sum via plain EvalRotate."""
    cc, kp = ckks
    rots = [1, 2, 3]
    cc.EvalRotateKeyGen(kp.secret_key, rots)
    x = np.linspace(-1, 1, 8)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))

    digits = cc.EvalFastRotationPrecompute(ct)
    acc = None
    for r in rots:
        ext = cc.EvalFastRotationExt(ct, r, digits, add_first=True)
        acc = ext if acc is None else cc.EvalAddExt(acc, ext)
    out = cc.KeySwitchDown(acc)
    got = cc.Decrypt(kp.secret_key, out).values.real

    want = sum(np.roll(x, -r) for r in rots)
    assert np.abs(got - want).max() < 1e-2

    # KeySwitchDownFirstElement matches element 0 of KeySwitchDown
    first = cc.KeySwitchDownFirstElement(acc)
    assert np.array_equal(np.asarray(first), np.asarray(out.elements[0]))


def test_sparse_keygen_roundtrip(ckks):
    cc, _ = ckks
    kp = cc.SparseKeyGen()
    x = np.linspace(-1, 1, 8)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    dec = cc.Decrypt(kp.secret_key, ct).values.real
    assert np.abs(dec - x).max() < 1e-3


def test_multi_add_pub_keys(ckks):
    """Two pk shares over a common `a` combine into the joint key for
    s1 + s2 (reference MultiAddPubKeys)."""
    cc, _ = ckks
    kp1 = cc.MultipartyKeyGen()
    kp2 = cc.MultipartyKeyGen(kp1.public_key)   # accumulated: b1 + share2
    b = cc.basis_qp
    share2 = PublicKey(b=mo.sub_mod(kp2.public_key.b, kp1.public_key.b,
                                    b.q),
                       a=kp1.public_key.a, key_tag=kp2.public_key.key_tag)
    joint = cc.MultiAddPubKeys(kp1.public_key, share2,
                               kp2.public_key.key_tag)
    assert np.array_equal(np.asarray(joint.b), np.asarray(kp2.public_key.b))

    s_joint = PrivateKey(
        s_qp=mo.add_mod(kp1.secret_key.s_qp, kp2.secret_key.s_qp, b.q),
        key_tag=joint.key_tag)
    x = np.linspace(-1, 1, 8)
    ct = cc.Encrypt(joint, cc.MakeCKKSPackedPlaintext(x, slots=8))
    dec = cc.Decrypt(s_joint, ct).values.real
    assert np.abs(dec - x).max() < 1e-3


def test_make_plaintext_dispatch(ckks):
    cc, kp = ckks
    x = np.linspace(-1, 1, 8)
    pt = cc.MakePlaintext(PlaintextEncodings.CKKS_PACKED_ENCODING, x)
    dec = cc.Decrypt(kp.secret_key,
                     cc.Encrypt(kp.public_key, pt)).values.real[:8]
    assert np.abs(dec - x).max() < 1e-3
