"""Advanced CKKS at 128-bit-class precision via composite scaling.

Port of /root/reference src/pke/examples/advanced-real-numbers-128.cpp.
The reference builds with NATIVEINT=128 to get 78-bit scaling moduli;
the TPU-native equivalent is COMPOSITESCALING (SURVEY §2.4): a 78-bit
effective scale assembled from three <2^27 device-word primes, giving
the same precision head-room on 32-bit lanes. Demos mirror the
reference: automatic vs manual rescaling, BV vs HYBRID key switching,
and hoisted (fast) rotations.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.pke.constants import (KeySwitchTechnique, PKESchemeFeature,
                                       ScalingTechnique, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams

x = np.array([1.0, 1.01, 1.02, 1.03, 1.04, 1.05, 1.06, 1.07])


def make_cc(technique, ks=KeySwitchTechnique.HYBRID, digit_size=0):
    # depth 7 (vs the reference's 5): composite-group products drift ~2e-4
    # between levels, so exact drift-matching on the final adds needs two
    # spare levels of modulus headroom — the 128-bit-native reference gets
    # the equivalent headroom from its ~2^-39 FIXEDMANUAL drift instead
    params = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256,
                      mult_depth=7, scaling_mod_size=78, first_mod_size=89,
                      composite_degree=3, register_word_size=27,
                      batch_size=8, ks_technique=ks,
                      digit_size=digit_size,
                      security_level=SecurityLevel.HEStd_NotSet,
                      scaling_technique=technique)
    cc = GenCryptoContext(params, seed=3)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    return cc


def automatic_rescale_demo():
    """x^18 + x^9 + 1 with no manual rescaling (reference
    AutomaticRescaleDemo — FIXEDAUTO on 128-bit; composite AUTO here)."""
    cc = make_cc(ScalingTechnique.COMPOSITESCALINGAUTO)
    keys = cc.KeyGen()
    cc.EvalMultKeyGen(keys.secret_key)
    ct = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    c2 = cc.EvalMult(ct, ct)                       # x^2
    c4 = cc.EvalMult(c2, c2)                       # x^4
    c8 = cc.EvalMult(c4, c4)                       # x^8
    c9 = cc.EvalMult(c8, ct)                       # x^9
    c18 = cc.EvalMult(c9, c9)                      # x^18
    res = cc.EvalAdd(cc.EvalAdd(c18, c9), 1.0)
    got = cc.Decrypt(keys.secret_key, res).values.real[:8]
    want = x ** 18 + x ** 9 + 1
    err = np.abs(got - want).max()
    print(f"AutomaticRescaleDemo x^18+x^9+1: max err {err:.2e}")
    assert err < 1e-8                               # ~2^-30 at 78-bit scales


def manual_rescale_demo():
    """Same computation, explicit Rescale calls (ManualRescaleDemo)."""
    cc = make_cc(ScalingTechnique.COMPOSITESCALINGMANUAL)
    keys = cc.KeyGen()
    cc.EvalMultKeyGen(keys.secret_key)
    ct = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    c2 = cc.Rescale(cc.EvalMult(ct, ct))
    c4 = cc.Rescale(cc.EvalMult(c2, c2))
    c8 = cc.Rescale(cc.EvalMult(c4, c4))
    ct_l3 = cc.LevelReduce(ct, 3)                   # match levels for x^9
    c9 = cc.Rescale(cc.EvalMult(c8, ct_l3))
    # x^18 via squaring x^9
    c18 = cc.Rescale(cc.EvalMult(c9, c9))
    c9_down = cc.LevelReduce(c9, c18.level - c9.level)
    res = cc.EvalAdd(cc.EvalAdd(c18, c9_down), 1.0)
    got = cc.Decrypt(keys.secret_key, res).values.real[:8]
    want = x ** 18 + x ** 9 + 1
    err = np.abs(got - want).max()
    print(f"ManualRescaleDemo    x^18+x^9+1: max err {err:.2e}")
    assert err < 1e-8


def key_switch_demo():
    """HYBRID vs BV key switching (reference HybridKeySwitchingDemo /
    demos around keyswitch-bv.h): same rotation under both techniques."""
    for ks, digit in ((KeySwitchTechnique.HYBRID, 0),
                      (KeySwitchTechnique.BV, 9)):
        cc = make_cc(ScalingTechnique.COMPOSITESCALINGAUTO, ks, digit)
        keys = cc.KeyGen()
        cc.EvalMultKeyGen(keys.secret_key)
        cc.EvalRotateKeyGen(keys.secret_key, [1])
        ct = cc.Encrypt(keys.public_key,
                        cc.MakeCKKSPackedPlaintext(x, slots=8))
        rot = cc.EvalRotate(ct, 1)
        got = cc.Decrypt(keys.secret_key, rot).values.real[:7]
        err = np.abs(got - x[1:]).max()
        print(f"{ks.name} key switching rotation: max err {err:.2e}")
        assert err < 1e-8


def fast_rotation_demo():
    """Hoisted rotations sharing one decomposition (FastRotationsDemo)."""
    cc = make_cc(ScalingTechnique.COMPOSITESCALINGAUTO)
    keys = cc.KeyGen()
    cc.EvalRotateKeyGen(keys.secret_key, [1, 2, 3])
    ct = cc.Encrypt(keys.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    pre = cc.EvalFastRotationPrecompute(ct)
    for r in (1, 2, 3):
        rot = cc.EvalFastRotation(ct, r, 2 * cc.ring_dim, pre)
        got = cc.Decrypt(keys.secret_key, rot).values.real[:8 - r]
        assert np.abs(got - x[r:]).max() < 1e-8
    print("hoisted rotations OK (128-bit-class precision)")


automatic_rescale_demo()
manual_rescale_demo()
key_switch_demo()
fast_rotation_demo()
