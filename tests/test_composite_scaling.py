"""Composite scaling: high-precision CKKS on 32-bit words
(reference COMPOSITESCALING*, ckksrns-parametergeneration.cpp)."""
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams


def test_composite_mult_precision():
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256, mult_depth=4,
                 scaling_mod_size=50, first_mod_size=56, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.COMPOSITESCALINGAUTO)
    cc = GenCryptoContext(p, seed=4)
    assert cc.comp_deg == 2
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalRotateKeyGen(kp.secret_key, [1])
    rng = np.random.default_rng(1)
    x = rng.normal(size=8) * 0.5
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    d = cc.Decrypt(kp.secret_key, cc.EvalMult(ct, ct)).values.real
    # ~50-bit scale: precision far beyond the 28-bit single-word chain
    assert np.abs(d - x * x).max() < 1e-9
    ct3 = cc.EvalMult(cc.EvalMult(ct, ct), ct)
    d3 = cc.Decrypt(kp.secret_key, ct3).values.real
    assert np.abs(d3 - x ** 3).max() < 1e-9
    d4 = cc.Decrypt(kp.secret_key, cc.EvalRotate(ct, 1)).values.real
    assert np.abs(d4 - np.roll(x, -1)).max() < 1e-9


def test_composite_full_packing_bootstrap():
    """FULL-slot bootstrap under composite scaling (round-1 verdict gap:
    full packing was only validated at 28-bit scales where EvalMod noise
    dominates). At ~2^50 effective scales a single round must clear
    ~10 bits of precision; tests/test_bootstrap covers the sparse paths.
    Reference analog: UnitTestBootstrap.cpp CKKS_BOOT_FULL rows."""
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=128, mult_depth=20,
                 scaling_mod_size=50, first_mod_size=56, aux_mod_size=26,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.COMPOSITESCALINGAUTO)
    cc = GenCryptoContext(p, seed=7)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE | PKESchemeFeature.ADVANCEDSHE
              | PKESchemeFeature.FHE)
    slots = 64                                       # N/2: fully packed
    cc.EvalBootstrapSetup(level_budget=(2, 2), slots=slots)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalBootstrapKeyGen(kp.secret_key, slots)
    rng = np.random.default_rng(5)
    x = rng.uniform(-0.5, 0.5, slots)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=slots))
    ct2 = cc.EvalBootstrap(ct)
    assert cc.size_ql(ct2.level) > 2                 # budget was raised
    dec = cc.Decrypt(kp.secret_key, ct2)
    err = np.abs(dec.values.real[:slots] - x).max()
    assert err < 2e-3, f"full-packing composite bootstrap err={err:.3e}"
