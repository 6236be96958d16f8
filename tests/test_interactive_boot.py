"""Interactive (2-round) bootstrapping: 2-party IntBoot* and n-party
IntMPBoot* (reference: UnitTestInteractiveBootstrap.cpp,
interactive-bootstrapping.cpp)."""
import numpy as np
import pytest

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams


@pytest.fixture(scope="module")
def ctx():
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=512, mult_depth=8,
                 scaling_mod_size=28, first_mod_size=30, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=9)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.MULTIPARTY):
        cc.Enable(f)
    kp1 = cc.MultipartyKeyGen()
    kp2 = cc.MultipartyKeyGen(kp1.public_key)
    return cc, kp1, kp2


def test_two_party_interactive_bootstrap(ctx):
    cc, kp1, kp2 = ctx
    x = np.array([0.25, -0.5, 0.75, 0.1, -0.3, 0.8, -0.2, 0.6])
    ct = cc.Encrypt(kp2.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    ct = cc.LevelReduce(ct, 4)
    before = cc.size_ql(ct.level)

    ct1 = cc.IntBootAdjustScale(ct)
    out1 = cc.IntBootDecrypt(kp1.secret_key, ct1)
    c1_only = ct1.replace(elements=(ct1.elements[1],))
    out2 = cc.IntBootDecrypt(kp2.secret_key, c1_only)
    out2 = cc.IntBootEncrypt(kp2.public_key, out2)
    out = cc.IntBootAdd(out2, out1)
    assert cc.size_ql(out.level) > before

    p1 = cc.MultipartyDecryptLead([out], kp1.secret_key)
    p2 = cc.MultipartyDecryptMain([out], kp2.secret_key)
    dec = cc.MultipartyDecryptFusion([p1[0], p2[0]], out)
    assert np.abs(dec.values.real[:8] - x).max() < 1e-2


def test_three_party_interactive_bootstrap(ctx):
    cc, kp1, kp2 = ctx
    kp3 = cc.MultipartyKeyGen(kp2.public_key)
    jpk = kp3.public_key
    x = np.linspace(-0.8, 0.8, 8)
    ct = cc.Encrypt(jpk, cc.MakeCKKSPackedPlaintext(x, slots=8))
    ct = cc.LevelReduce(ct, 4)
    before = cc.size_ql(ct.level)

    ctc = cc.IntMPBootAdjustScale(ct)
    a = cc.IntMPBootRandomElementGen(jpk)
    c1_only = ctc.replace(elements=(ctc.elements[1],))
    shares = [cc.IntMPBootDecrypt(kp.secret_key, c1_only, a)
              for kp in (kp1, kp2, kp3)]
    agg = cc.IntMPBootAdd(shares)
    out = cc.IntMPBootEncrypt(jpk, agg, a, ctc)
    assert cc.size_ql(out.level) > before

    q1 = cc.MultipartyDecryptLead([out], kp1.secret_key)
    q2 = cc.MultipartyDecryptMain([out], kp2.secret_key)
    q3 = cc.MultipartyDecryptMain([out], kp3.secret_key)
    dec = cc.MultipartyDecryptFusion([q1[0], q2[0], q3[0]], out)
    assert np.abs(dec.values.real[:8] - x).max() < 1e-2
