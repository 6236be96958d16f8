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
