"""CKKS end-to-end tests: encrypt->eval->decrypt vs. plaintext computation.

Reference analog: src/pke/unittest/utckksrns/UnitTestCKKSrns.cpp — the
round-trip oracle with epsilon comparisons (SURVEY.md §4).
"""
import numpy as np
import pytest

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams


def make_ctx(depth=3, n=256, scal=ScalingTechnique.FLEXIBLEAUTO):
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=n, mult_depth=depth,
                 scaling_mod_size=28, first_mod_size=30, batch_size=n // 2,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=scal)
    cc = GenCryptoContext(p, seed=42)
    cc.Enable(PKESchemeFeature.PKE)
    cc.Enable(PKESchemeFeature.KEYSWITCH)
    cc.Enable(PKESchemeFeature.LEVELEDSHE)
    return cc


@pytest.fixture(scope="module")
def ctx_and_keys():
    cc = make_ctx()
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalRotateKeyGen(kp.secret_key, [1, -1, 2])
    return cc, kp


def test_encrypt_decrypt(ctx_and_keys):
    cc, kp = ctx_and_keys
    rng = np.random.default_rng(0)
    z = rng.normal(size=cc.slots) + 1j * rng.normal(size=cc.slots)
    pt = cc.MakeCKKSPackedPlaintext(z)
    ct = cc.Encrypt(kp.public_key, pt)
    dec = cc.Decrypt(kp.secret_key, ct)
    assert np.abs(dec.values - z).max() < 1e-4


def test_encrypt_sk_decrypt(ctx_and_keys):
    cc, kp = ctx_and_keys
    z = np.arange(cc.slots) / cc.slots
    ct = cc.Encrypt(kp.secret_key, cc.MakeCKKSPackedPlaintext(z))
    dec = cc.Decrypt(kp.secret_key, ct)
    assert np.abs(dec.values - z).max() < 1e-4


def test_add_sub(ctx_and_keys):
    cc, kp = ctx_and_keys
    rng = np.random.default_rng(1)
    x = rng.normal(size=cc.slots)
    y = rng.normal(size=cc.slots)
    ctx_ = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x))
    cty = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(y))
    s = cc.Decrypt(kp.secret_key, cc.EvalAdd(ctx_, cty))
    d = cc.Decrypt(kp.secret_key, cc.EvalSub(ctx_, cty))
    assert np.abs(s.values - (x + y)).max() < 1e-3
    assert np.abs(d.values - (x - y)).max() < 1e-3


def test_mult_relin_rescale(ctx_and_keys):
    cc, kp = ctx_and_keys
    rng = np.random.default_rng(2)
    x = rng.normal(size=cc.slots)
    y = rng.normal(size=cc.slots)
    ctx_ = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x))
    cty = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(y))
    ctm = cc.EvalMult(ctx_, cty)
    dec = cc.Decrypt(kp.secret_key, ctm)
    assert np.abs(dec.values - x * y).max() < 1e-2
    # chain: depth-3 product
    ctm2 = cc.EvalMult(ctm, ctx_)
    dec2 = cc.Decrypt(kp.secret_key, ctm2)
    assert np.abs(dec2.values - x * x * y).max() < 5e-2


def test_mult_plain_and_scalar(ctx_and_keys):
    cc, kp = ctx_and_keys
    x = np.linspace(-1, 1, cc.slots)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x))
    ct2 = cc.EvalMult(ct, 0.5)
    dec = cc.Decrypt(kp.secret_key, cc.ModReduce(ct2))
    assert np.abs(dec.values - 0.5 * x).max() < 1e-3
    ct3 = cc.EvalAdd(ct, 1.0)
    dec3 = cc.Decrypt(kp.secret_key, ct3)
    assert np.abs(dec3.values - (x + 1.0)).max() < 1e-3


def test_rotate(ctx_and_keys):
    cc, kp = ctx_and_keys
    x = np.arange(cc.slots, dtype=float)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x))
    r1 = cc.Decrypt(kp.secret_key, cc.EvalRotate(ct, 1)).values
    rm1 = cc.Decrypt(kp.secret_key, cc.EvalRotate(ct, -1)).values
    assert np.abs(r1 - np.roll(x, -1)).max() < 1e-3, "rot +1 should shift left"
    assert np.abs(rm1 - np.roll(x, 1)).max() < 1e-3


def test_flexibleautoext_depth_chain():
    """FLEXIBLEAUTOEXT (reference ckksrns-parametergeneration.cpp:518):
    extra ~2^19 top modulus; fresh ciphertexts encode at the big degree-2
    scale q_ext*q_top and the first rescale drops q_ext.  Precision should
    match or beat FLEXIBLEAUTO since fresh noise sits below the scale."""
    cc = make_ctx(depth=4, n=128,
                  scal=ScalingTechnique.FLEXIBLEAUTOEXT)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    assert cc.moduli_q[-1].bit_length() < 21      # the ext modulus
    x = np.linspace(-1, 1, 8)
    y = np.linspace(0.5, -0.5, 8)
    ctx = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    cty = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(y, slots=8))
    assert ctx.noise_deg == 2 and ctx.level == 0
    ct = ctx
    expect = x.copy()
    for _ in range(4):
        ct = cc.EvalMult(ct, cty)
        expect = expect * y
    d = cc.Decrypt(kp.secret_key, ct)
    assert np.abs(d.values.real - expect).max() < 1e-5
    # mixed-level adjust path: fresh (lvl 0, deg 2) + consumed operand
    mixed = cc.EvalAdd(cc.EvalMult(ctx, cty), ctx)
    dm = cc.Decrypt(kp.secret_key, mixed)
    assert np.abs(dm.values.real - (x * y + x)).max() < 1e-4
