"""BGV/BFV round-trip tests: exact integer arithmetic oracle.

Reference analog: src/pke/unittest/utbgvrns/UnitTestBGVrns.cpp and
utbfvrns/* — encrypt->eval->decrypt must match plaintext arithmetic mod t
exactly (SURVEY.md §4).
"""
import numpy as np
import pytest

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams

N = 512
T = 12289  # prime, 12289 = 12*1024 + 1 = 1 mod 2N for N=512


def make_ctx(scheme, depth=2):
    p = CCParams(scheme=scheme, ring_dim=N, mult_depth=depth,
                 plaintext_modulus=T, scaling_mod_size=28, first_mod_size=30,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FIXEDAUTO)
    cc = GenCryptoContext(p, seed=11)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE)
    return cc


@pytest.fixture(scope="module", params=[Scheme.BGVRNS_SCHEME,
                                        Scheme.BFVRNS_SCHEME])
def ctx_keys(request):
    cc = make_ctx(request.param)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalRotateKeyGen(kp.secret_key, [1, -1])
    return cc, kp


def test_encrypt_decrypt_exact(ctx_keys):
    cc, kp = ctx_keys
    v = np.arange(12, dtype=np.int64) + 1
    pt = cc.MakePackedPlaintext(v)
    ct = cc.Encrypt(kp.public_key, pt)
    dec = cc.Decrypt(kp.secret_key, ct)
    assert dec.values[:12].tolist() == v.tolist()
    assert (dec.values[12:] == 0).all()


def test_add_sub_exact(ctx_keys):
    cc, kp = ctx_keys
    rng = np.random.default_rng(0)
    x = rng.integers(0, T, 20)
    y = rng.integers(0, T, 20)
    cx = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(x))
    cy = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(y))
    s = cc.Decrypt(kp.secret_key, cc.EvalAdd(cx, cy))
    d = cc.Decrypt(kp.secret_key, cc.EvalSub(cx, cy))
    assert s.values[:20].tolist() == ((x + y) % T).tolist()
    assert d.values[:20].tolist() == ((x - y) % T).tolist()


def test_mult_exact(ctx_keys):
    cc, kp = ctx_keys
    rng = np.random.default_rng(1)
    x = rng.integers(0, T, 16)
    y = rng.integers(0, T, 16)
    cx = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(x))
    cy = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(y))
    cm = cc.EvalMult(cx, cy)
    dec = cc.Decrypt(kp.secret_key, cm)
    assert dec.values[:16].tolist() == (x * y % T).tolist()
    # depth 2
    cm2 = cc.EvalMult(cm, cx)
    dec2 = cc.Decrypt(kp.secret_key, cm2)
    assert dec2.values[:16].tolist() == (x * x * y % T).tolist()


def test_mult_plain_and_add_plain(ctx_keys):
    cc, kp = ctx_keys
    x = np.arange(10, dtype=np.int64)
    cx = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(x))
    pt = cc.MakePackedPlaintext(np.full(10, 3, np.int64))
    dec = cc.Decrypt(kp.secret_key, cc.EvalMult(cx, pt))
    assert dec.values[:10].tolist() == (3 * x % T).tolist()
    dec2 = cc.Decrypt(kp.secret_key, cc.EvalAdd(cx, pt))
    assert dec2.values[:10].tolist() == ((x + 3) % T).tolist()


def test_rotation_exact(ctx_keys):
    cc, kp = ctx_keys
    half = cc.ring_dim // 2
    x = np.arange(half, dtype=np.int64) + 1   # fill row 0 fully
    cx = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(x))
    r = cc.Decrypt(kp.secret_key, cc.EvalRotate(cx, 1))
    assert r.values[:half].tolist() == np.roll(x, -1).tolist()


def test_bfv_hpspoverqleveled_exact():
    """HPSPOVERQLEVELED (reference bfvrns-leveledshe.cpp:263): drop towers
    the accumulated noise consumed before tensoring; results stay exact."""
    from openfhe_tpu.pke.constants import MultiplicationTechnique
    p = CCParams(scheme=Scheme.BFVRNS_SCHEME, ring_dim=64,
                 plaintext_modulus=257, mult_depth=3,
                 scaling_mod_size=28,
                 security_level=SecurityLevel.HEStd_NotSet,
                 multiplication_technique=(
                     MultiplicationTechnique.HPSPOVERQLEVELED))
    cc = GenCryptoContext(p, seed=5)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 257, 64)
    y = rng.integers(0, 257, 64)
    ctx = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(x))
    cty = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(y))
    ct = cc.EvalMult(ctx, cty)
    expect = x * y % 257
    for _ in range(2):
        ct = cc.EvalMult(ct, cty)
        expect = expect * y % 257
    assert ct.noise_deg == 4   # three multiplications tracked
    dec = cc.Decrypt(kp.secret_key, ct)
    assert np.array_equal(np.mod(dec.values[:64], 257), expect)


def test_bfv_technique_variants_agree():
    """BEHZ/HPS/HPSPOVERQ dispatch to the shared exact path and all
    decrypt to the same product."""
    from openfhe_tpu.pke.constants import MultiplicationTechnique as MT
    rng = np.random.default_rng(1)
    x = rng.integers(0, 257, 32)
    y = rng.integers(0, 257, 32)
    for tech in (MT.BEHZ, MT.HPS, MT.HPSPOVERQ):
        p = CCParams(scheme=Scheme.BFVRNS_SCHEME, ring_dim=64,
                     plaintext_modulus=257, mult_depth=2,
                     scaling_mod_size=28,
                     security_level=SecurityLevel.HEStd_NotSet,
                     multiplication_technique=tech)
        cc = GenCryptoContext(p, seed=6)
        for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
                  PKESchemeFeature.LEVELEDSHE):
            cc.Enable(f)
        kp = cc.KeyGen()
        cc.EvalMultKeyGen(kp.secret_key)
        ct = cc.EvalMult(cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(x)),
                         cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(y)))
        dec = cc.Decrypt(kp.secret_key, ct)
        assert np.array_equal(np.mod(dec.values[:32], 257),
                              x * y % 257), tech


def test_bfv_extended_encryption():
    """EncryptionTechnique.EXTENDED (reference bfvrns-pke.cpp): encrypt
    over Q*r then divide-round by r. Round-trip must be exact and the
    fresh noise strictly smaller than STANDARD's."""
    from openfhe_tpu.pke.constants import EncryptionTechnique

    def build(tech):
        p = CCParams(scheme=Scheme.BFVRNS_SCHEME, ring_dim=N, mult_depth=2,
                     plaintext_modulus=T, scaling_mod_size=28,
                     first_mod_size=30,
                     security_level=SecurityLevel.HEStd_NotSet,
                     encryption_technique=tech)
        cc = GenCryptoContext(p, seed=21)
        cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
                  | PKESchemeFeature.LEVELEDSHE)
        kp = cc.KeyGen()
        cc.EvalMultKeyGen(kp.secret_key)
        return cc, kp

    v = np.arange(16, dtype=np.int64) % 11
    w = (np.arange(16, dtype=np.int64) * 5) % 13

    cc, kp = build(EncryptionTechnique.EXTENDED)
    cv = cc.Encrypt(kp.public_key, cc.MakePackedPlaintext(v))
    cw = cc.Encrypt(kp.secret_key, cc.MakePackedPlaintext(w))
    dec = cc.Decrypt(kp.secret_key, cv)
    assert dec.values[:16].tolist() == v.tolist()
    m = cc.EvalMult(cv, cw)
    decm = cc.Decrypt(kp.secret_key, m)
    assert decm.values[:16].tolist() == (v * w % T).tolist()
    s = cc.EvalAdd(m, cv)
    assert (np.asarray(cc.Decrypt(kp.secret_key, s).values[:16]) % T
            == (v * w + v) % T).tolist()
