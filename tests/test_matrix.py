"""Parameterized scheme x technique matrix — the reference's dominant test
pattern (UnitTestBGVrns.cpp:36-1160: a static table of CCParams combos, one
TEST_P dispatcher). Each case: context gen -> keygen -> encrypt -> a small
eval program (add, mult+relin, rotate) -> decrypt round-trip vs plaintext
computation. Exact for BFV/BGV, epsilon for CKKS.

Small rings (N=256) keep the CPU suite fast; production sizes are covered
by the TPU bench and bootstrap validation.
"""

import numpy as np
import pytest

from openfhe_tpu.pke.constants import (KeySwitchTechnique, PKESchemeFeature,
                                       ScalingTechnique, Scheme,
                                       SecretKeyDist, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams

RING = 256          # CKKS; integer schemes use 512 with t=12289
FEATS = (PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
         | PKESchemeFeature.LEVELEDSHE)


def _case_id(c):
    return "-".join(getattr(x, "name", str(x)) for x in c)


# (scheme, scaling technique, keyswitch, secret dist) — mirrors the
# reference's table style; NORESCALE / composite rows included where valid
MATRIX = [
    # BGV: every scaling technique x both keyswitch x dists
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FIXEDMANUAL,
     KeySwitchTechnique.HYBRID, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FIXEDMANUAL,
     KeySwitchTechnique.BV, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FIXEDAUTO,
     KeySwitchTechnique.HYBRID, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FIXEDAUTO,
     KeySwitchTechnique.BV, SecretKeyDist.GAUSSIAN),
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FLEXIBLEAUTO,
     KeySwitchTechnique.HYBRID, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FLEXIBLEAUTO,
     KeySwitchTechnique.BV, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FLEXIBLEAUTO,
     KeySwitchTechnique.HYBRID, SecretKeyDist.SPARSE_TERNARY),
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FLEXIBLEAUTOEXT,
     KeySwitchTechnique.HYBRID, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FLEXIBLEAUTOEXT,
     KeySwitchTechnique.BV, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FLEXIBLEAUTOEXT,
     KeySwitchTechnique.HYBRID, SecretKeyDist.GAUSSIAN),
    # CKKS: scaling techniques x keyswitch x dists
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.FIXEDMANUAL,
     KeySwitchTechnique.HYBRID, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.FIXEDMANUAL,
     KeySwitchTechnique.BV, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.FIXEDAUTO,
     KeySwitchTechnique.HYBRID, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.FIXEDAUTO,
     KeySwitchTechnique.BV, SecretKeyDist.SPARSE_TERNARY),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.FLEXIBLEAUTO,
     KeySwitchTechnique.HYBRID, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.FLEXIBLEAUTO,
     KeySwitchTechnique.BV, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.FLEXIBLEAUTO,
     KeySwitchTechnique.HYBRID, SecretKeyDist.GAUSSIAN),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.FLEXIBLEAUTOEXT,
     KeySwitchTechnique.HYBRID, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.FLEXIBLEAUTOEXT,
     KeySwitchTechnique.BV, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.COMPOSITESCALINGAUTO,
     KeySwitchTechnique.HYBRID, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.COMPOSITESCALINGMANUAL,
     KeySwitchTechnique.HYBRID, SecretKeyDist.UNIFORM_TERNARY),
    # BFV: technique enum varies elsewhere (one RNS path); cover
    # keyswitch x dists
    (Scheme.BFVRNS_SCHEME, ScalingTechnique.FIXEDMANUAL,
     KeySwitchTechnique.HYBRID, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.BFVRNS_SCHEME, ScalingTechnique.FIXEDMANUAL,
     KeySwitchTechnique.BV, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.BFVRNS_SCHEME, ScalingTechnique.FIXEDMANUAL,
     KeySwitchTechnique.HYBRID, SecretKeyDist.GAUSSIAN),
    (Scheme.BFVRNS_SCHEME, ScalingTechnique.FIXEDMANUAL,
     KeySwitchTechnique.BV, SecretKeyDist.SPARSE_TERNARY),
    # additional dist/keyswitch coverage (reference table rows)
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FIXEDMANUAL,
     KeySwitchTechnique.HYBRID, SecretKeyDist.SPARSE_TERNARY),
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FIXEDAUTO,
     KeySwitchTechnique.HYBRID, SecretKeyDist.GAUSSIAN),
    (Scheme.BGVRNS_SCHEME, ScalingTechnique.FLEXIBLEAUTOEXT,
     KeySwitchTechnique.BV, SecretKeyDist.SPARSE_TERNARY),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.FIXEDMANUAL,
     KeySwitchTechnique.HYBRID, SecretKeyDist.SPARSE_TERNARY),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.FIXEDAUTO,
     KeySwitchTechnique.HYBRID, SecretKeyDist.GAUSSIAN),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.COMPOSITESCALINGAUTO,
     KeySwitchTechnique.BV, SecretKeyDist.UNIFORM_TERNARY),
    (Scheme.CKKSRNS_SCHEME, ScalingTechnique.COMPOSITESCALINGAUTO,
     KeySwitchTechnique.HYBRID, SecretKeyDist.SPARSE_TERNARY),
]


@pytest.mark.parametrize("scheme,scal,ks,dist", MATRIX,
                         ids=[_case_id(c) for c in MATRIX])
def test_matrix_roundtrip(scheme, scal, ks, dist):
    kwargs = dict(scheme=scheme, ring_dim=RING, mult_depth=2,
                  security_level=SecurityLevel.HEStd_NotSet,
                  ks_technique=ks, secret_key_dist=dist)
    if ks == KeySwitchTechnique.BV:
        # BV rotations need the relinWindow digit decomposition
        # (digit_size=0 pure-RNS only suits deg-2 relin; see
        # tests/test_keyswitch_bv.py)
        kwargs.update(digit_size=5)
    if scheme == Scheme.CKKSRNS_SCHEME:
        if scal in (ScalingTechnique.COMPOSITESCALINGAUTO,
                    ScalingTechnique.COMPOSITESCALINGMANUAL):
            kwargs.update(scaling_mod_size=50, first_mod_size=56,
                          scaling_technique=scal)
        else:
            kwargs.update(scaling_mod_size=28, first_mod_size=30,
                          scaling_technique=scal)
    elif scheme == Scheme.BGVRNS_SCHEME:
        kwargs.update(ring_dim=512, plaintext_modulus=12289,
                      scaling_technique=scal)
    else:
        kwargs.update(ring_dim=512, plaintext_modulus=12289)
    cc = GenCryptoContext(CCParams(**kwargs), seed=11)
    cc.Enable(FEATS)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalRotateKeyGen(kp.secret_key, [1])

    if scheme == Scheme.CKKSRNS_SCHEME:
        x = np.linspace(-1, 1, cc.slots)
        y = np.linspace(0.5, -0.5, cc.slots)
        ct_x = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x))
        ct_y = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(y))
        ct = cc.EvalAdd(cc.EvalMult(ct_x, ct_y), ct_x)
        want = x * y + x
        got = np.asarray(cc.Decrypt(kp.secret_key, ct).values.real)
        assert np.abs(got[:cc.slots] - want).max() < 1e-3
        rot = cc.EvalRotate(ct_x, 1)
        gotr = np.asarray(cc.Decrypt(kp.secret_key, rot).values.real)
        assert np.abs(gotr[:cc.slots - 1] - x[1:]).max() < 1e-3
    else:
        v = np.arange(16, dtype=np.int64) % 7
        w = (np.arange(16, dtype=np.int64) * 3) % 5
        ct_v = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(v))
        ct_w = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(w))
        ct = cc.EvalAdd(cc.EvalMult(ct_v, ct_w), ct_v)
        t = 12289
        want = (v * w + v) % t
        dec = cc.Decrypt(kp.secret_key, ct)
        got = np.asarray(dec.values[:16]) % t
        np.testing.assert_array_equal(got, want)
        rot = cc.EvalRotate(ct_v, 1)
        decr = np.asarray(cc.Decrypt(kp.secret_key, rot).values[:15])
        np.testing.assert_array_equal(decr % t, v[1:] % t)


# ---------------------------------------------------------------------------
# BFV multiplication-technique x encryption-technique sub-matrix
# (reference: UnitTestBFVrns* TEST_P tables over BEHZ/HPS/HPSPOVERQ/
#  HPSPOVERQLEVELED x STANDARD/EXTENDED)
# ---------------------------------------------------------------------------
from openfhe_tpu.pke.constants import (EncryptionTechnique,
                                       MultiplicationTechnique)

BFV_TECH = [(m, e)
            for m in (MultiplicationTechnique.BEHZ,
                      MultiplicationTechnique.HPS,
                      MultiplicationTechnique.HPSPOVERQ,
                      MultiplicationTechnique.HPSPOVERQLEVELED)
            for e in (EncryptionTechnique.STANDARD,
                      EncryptionTechnique.EXTENDED)]


@pytest.mark.parametrize("mult_tech,enc_tech", BFV_TECH,
                         ids=[f"{m.name}-{e.name}" for m, e in BFV_TECH])
def test_bfv_technique_matrix(mult_tech, enc_tech):
    t = 12289
    cc = GenCryptoContext(CCParams(
        scheme=Scheme.BFVRNS_SCHEME, ring_dim=512, plaintext_modulus=t,
        mult_depth=2, security_level=SecurityLevel.HEStd_NotSet,
        multiplication_technique=mult_tech,
        encryption_technique=enc_tech), seed=11)
    cc.Enable(FEATS)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    v = np.arange(16, dtype=np.int64) % 7
    w = (np.arange(16, dtype=np.int64) * 3) % 5
    ct_v = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(v))
    ct_w = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(w))
    ct = cc.EvalMult(cc.EvalMult(ct_v, ct_w), ct_v)
    got = np.asarray(cc.Decrypt(kp.secret_key, ct).values[:16]) % t
    np.testing.assert_array_equal(got, (v * w * v) % t)
