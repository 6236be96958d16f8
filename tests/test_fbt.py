"""EvalFBT: vectorized functional bootstrapping (reference: EvalFBTSetup /
EvalMVBPrecompute, ckksrns-fhe.cpp:2820-3280; UnitTestFBT.cpp)."""
import numpy as np
import pytest

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.pke.schemelet import SchemeletRLWEMP as SL


def test_eval_fbt_lut():
    n = 512
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=n, mult_depth=22,
                 scaling_mod_size=28, first_mod_size=30, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=6)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
              PKESchemeFeature.FHE):
        cc.Enable(f)
    slots = 8
    cc.EvalFBTSetup(num_slots=slots, p_in=8)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalFBTKeyGen(kp.secret_key, slots)

    p_in = 8
    digits = np.arange(p_in)
    lut = np.array([3, 0, 5, 1, 7, 2, 6, 4])
    q0 = cc.moduli_q[0]
    last = len(cc.moduli_q) - 1
    ct_polys = SL.encrypt_coeff(cc, kp.secret_key, digits, q0, p_in,
                                level=last)
    ct = SL.convert_rlwe_to_ckks(cc, ct_polys, q0, slots=slots, level=last,
                                 scale=q0 / p_in)
    ct = ct.replace(key_tag=kp.secret_key.key_tag)

    # slot-valued output
    out = cc.EvalFBT(ct, lut, p_in, decode=False)
    got = cc.Decrypt(kp.secret_key, out).values.real[:slots]
    assert np.abs(got - lut[digits]).max() < 0.3

    # coefficient-decoded output through the schemelet
    out2 = cc.EvalFBT(ct, lut, p_in, decode=True)
    qlv = 1
    for q in cc.moduli_q[:cc.size_ql(out2.level)]:
        qlv *= q
    back = SL.convert_ckks_to_rlwe(cc, out2, qlv)
    dec = SL.decrypt_coeff(cc, kp.secret_key, back, qlv, p_in,
                           level=out2.level, num_slots=slots)
    assert np.array_equal(dec % p_in, lut[digits] % p_in)


def test_eval_mvb_shared_powers():
    """EvalMVBPrecompute + EvalMVB: several LUTs amortize one bootstrap
    (reference cryptocontext.h:3588-3601)."""
    n = 512
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=n, mult_depth=22,
                 scaling_mod_size=28, first_mod_size=30, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=6)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE, PKESchemeFeature.ADVANCEDSHE,
              PKESchemeFeature.FHE):
        cc.Enable(f)
    slots, p_in = 8, 8
    cc.EvalFBTSetup(num_slots=slots, p_in=p_in)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalFBTKeyGen(kp.secret_key, slots)

    digits = np.arange(p_in)
    q0 = cc.moduli_q[0]
    last = len(cc.moduli_q) - 1
    ct_polys = SL.encrypt_coeff(cc, kp.secret_key, digits, q0, p_in,
                                level=last)
    ct = SL.convert_rlwe_to_ckks(cc, ct_polys, q0, slots=slots, level=last,
                                 scale=q0 / p_in)
    ct = ct.replace(key_tag=kp.secret_key.key_tag)

    powers = cc.EvalMVBPrecompute(ct, p_in)
    lut1 = np.array([3, 0, 5, 1, 7, 2, 6, 4])
    lut2 = (digits * digits) % p_in
    for lut in (lut1, lut2):
        out = cc.EvalMVBNoDecoding(powers, lut, p_in)
        got = cc.Decrypt(kp.secret_key, out).values.real[:slots]
        assert np.abs(got - lut[digits]).max() < 0.3, lut
