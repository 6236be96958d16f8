"""Parallel (mesh/sharding) + profiling + binfhe serialization tests.

Reference analog: parallel.h OpenFHEParallelControls semantics mapped onto
jax.sharding (SURVEY.md §2.5), Serial:: round-trips for binfhe objects
(binfhe-ser.h).
"""
import numpy as np

import jax

from openfhe_tpu.parallel import (OpenFHEParallelControls, replicate,
                                  shard_batch, shard_ciphertext)
from openfhe_tpu.utils import serialization as ser
from openfhe_tpu.utils.profiling import TIC, TOC, stage


def test_mesh_default_shape():
    mesh = OpenFHEParallelControls.get_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("dp", "limb")


def test_shard_batch_and_replicate():
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sx = shard_batch(x)
    assert np.allclose(np.asarray(sx), x)
    r = replicate(np.ones(3, np.float32))
    assert np.asarray(r).sum() == 3.0


def test_shard_ciphertext_preserves_values(ckks64):
    cc, kp = ckks64
    x = np.linspace(-1, 1, 8)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(x, slots=8))
    sct = shard_ciphertext(ct)
    dec = cc.Decrypt(kp.secret_key, sct)
    assert np.abs(dec.values.real - x).max() < 1e-4


def test_profiling_helpers():
    t0 = TIC()
    with stage("unit-test"):
        pass
    assert TOC(t0) >= 0.0


def test_lwe_serialization_roundtrip():
    from openfhe_tpu.binfhe.context import BinFHEContext

    cc = BinFHEContext()
    cc.GenerateBinFHEContext("TOY", method="GINX")
    sk = cc.KeyGen()
    ct = cc.Encrypt(sk, 1)

    blob = ser.serialize(ct)
    ct2 = ser.deserialize(blob)
    assert cc.Decrypt(sk, ct2) == 1
    assert ct2.modulus == ct.modulus

    js = ser.serialize(sk, ser.SerType.JSON)
    sk2 = ser.deserialize(js, ser.SerType.JSON)
    assert np.array_equal(np.asarray(sk.s), np.asarray(sk2.s))


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def ckks64():
    from openfhe_tpu.pke.constants import (PKESchemeFeature,
                                           ScalingTechnique, Scheme,
                                           SecurityLevel)
    from openfhe_tpu.pke.context import GenCryptoContext
    from openfhe_tpu.pke.parameters import CCParams

    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=64, mult_depth=2,
                 scaling_mod_size=28, first_mod_size=30,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FLEXIBLEAUTO)
    cc = GenCryptoContext(p, seed=7)
    for f in (PKESchemeFeature.PKE, PKESchemeFeature.KEYSWITCH,
              PKESchemeFeature.LEVELEDSHE):
        cc.Enable(f)
    kp = cc.KeyGen()
    return cc, kp


def test_ciphertext_metadata_map(ckks64):
    """Reference ciphertext.h m_metadataMap semantics."""
    cc, kp = ckks64
    ct = cc.Encrypt(kp.public_key,
                    cc.MakeCKKSPackedPlaintext(np.ones(8), slots=8))
    ct2 = ct.SetMetadataByKey("tag", {"owner": "alice"})
    assert ct2.FindMetadataByKey("tag")
    assert not ct.FindMetadataByKey("tag")         # original untouched
    assert ct2.GetMetadataByKey("tag")["owner"] == "alice"
    ct3 = ct2.SetMetadataByKey("tag", 7).Clone()
    assert ct3.GetMetadataByKey("tag") == 7
    assert len(ct3.GetMetadataMap()) == 1
    try:
        ct.GetMetadataByKey("missing")
        assert False
    except KeyError:
        pass
    # metadata survives homomorphic ops through replace()
    ct4 = cc.EvalAdd(ct2, ct2)
    assert ct4.FindMetadataByKey("tag")


def test_shard_map_mult_relin_matches_unsharded():
    """Limb-axis shard_map keyswitch (parallel/sharded.py) must agree
    bit-exactly with the single-device path for a full mult+relin+rescale
    (VERDICT r1 item 4; reference analog: the OpenMP tower loops this
    replaces, dcrtpoly-impl.h:239ff)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from openfhe_tpu.lattice.dcrt import Poly
    from openfhe_tpu.lattice import rns_tools as rt
    from openfhe_tpu.math import modops as mo
    from openfhe_tpu.parallel import sharded as shd
    from openfhe_tpu.pke.constants import (PKESchemeFeature,
                                           ScalingTechnique, Scheme,
                                           SecurityLevel)
    from openfhe_tpu.pke.context import GenCryptoContext
    from openfhe_tpu.pke.keyswitch import hybrid
    from openfhe_tpu.pke.parameters import CCParams

    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=256, mult_depth=7,
                 scaling_mod_size=26, first_mod_size=28, aux_mod_size=20,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FIXEDMANUAL)
    cc = GenCryptoContext(p, seed=3)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    z = np.linspace(-1, 1, cc.slots)
    ct_a = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(z))
    ct_b = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(z))

    size = cc.size_ql(0)
    tabs = shd.make_sharded_tables(cc, size)
    limb = 2
    assert (size % limb == 0) and ((size + tabs.kp) % limb == 0), \
        (size, tabs.kp)
    devices = np.array(jax.devices()[:limb]).reshape(1, limb)
    mesh = Mesh(devices, ("dp", "limb"))

    spec = P("limb", None)
    f = shard_map(
        lambda a0, a1, b0, b1, t: shd.mult_relin_local(a0, a1, b0, b1, t),
        mesh=mesh, in_specs=(spec, spec, spec, spec, shd.table_specs(tabs)),
        out_specs=(spec, spec), check_rep=False)

    rtab = cc.rescale_tables(size)
    basis_q = cc.basis_q

    with mesh:
        o0, o1 = jax.jit(f)(*ct_a.elements, *ct_b.elements, tabs)
        r0 = rt.drop_last_and_scale(Poly(o0, 1), basis_q, rtab).data
        r1 = rt.drop_last_and_scale(Poly(o1, 1), basis_q, rtab).data
        jax.block_until_ready((r0, r1))

    htabs = cc.hybrid_tables(size)
    ek = cc.eval_mult_keys[kp.secret_key.key_tag]
    basis = htabs.basis_ql
    mm = lambda x, y: mo.mul_mod(x, y, basis.q, basis.r32, basis.r32_sh,
                                 basis.m32)
    a0, a1 = ct_a.elements
    b0, b1 = ct_b.elements
    c0 = mm(a0, b0)
    c1 = mo.add_mod(mm(a0, b1), mm(a1, b0), basis.q)
    c2 = mm(a1, b1)
    d0, d1 = hybrid.keyswitch_core(c2, ek, htabs)
    u0 = mo.add_mod(c0, d0, basis.q)
    u1 = mo.add_mod(c1, d1, basis.q)
    w0 = rt.drop_last_and_scale(Poly(u0, 1), basis_q, rtab).data
    w1 = rt.drop_last_and_scale(Poly(u1, 1), basis_q, rtab).data

    np.testing.assert_array_equal(np.asarray(r0), np.asarray(w0))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(w1))


def test_staged_ntt_sharded_matches_unsharded():
    """Cross-chip staged 4-step NTT (parallel/ntt_sharded): bit-exact vs
    the single-device VPU transform on the virtual 8-device mesh
    (SURVEY §7.11 staged cross-chip NTT)."""
    import numpy as np
    from jax.sharding import Mesh
    from openfhe_tpu.lattice.basis import make_basis
    from openfhe_tpu.math.nbtheory import first_prime, next_prime
    from openfhe_tpu.ops.ntt import _ntt_fwd_vpu, _ntt_inv_vpu
    from openfhe_tpu.parallel import ntt_sharded as ns

    n = 1 << 12                       # R = C = 64, divisible by 8 devices
    q0 = first_prime(26, 2 * n)
    q1 = next_prime(q0, 2 * n)
    b = make_basis([q0, q1], n)
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("limb",))
    rng = np.random.default_rng(3)
    x = rng.integers(0, min(q0, q1), (2, n)).astype(np.uint32)

    got = np.asarray(ns.ntt_fwd_sharded(x, b, mesh))
    want = np.asarray(_ntt_fwd_vpu(x, b))
    np.testing.assert_array_equal(got, want)

    back = np.asarray(ns.ntt_inv_sharded(want, b, mesh))
    np.testing.assert_array_equal(back, x)
    np.testing.assert_array_equal(back, np.asarray(_ntt_inv_vpu(want, b)))
