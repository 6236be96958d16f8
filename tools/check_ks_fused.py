"""Correctness gate for the fused Pallas keyswitch vs the XLA reference chain.

Runs on the real TPU at N=2^14 (the smallest ring where ks_fused engages)
and asserts bit-exact agreement of keyswitch_core and mult_relin_fused
against the unfused hybrid path. Run after any kernel-level change:
    python tools/check_ks_fused.py
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.pke.keyswitch import hybrid, ks_fused


def main():
    n = 1 << 14
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=n, mult_depth=8,
                 scaling_mod_size=26, first_mod_size=27, aux_mod_size=27,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.FIXEDMANUAL)
    cc = GenCryptoContext(p, seed=11)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    ek = cc.eval_mult_keys[kp.secret_key.key_tag]

    failures = 0
    for size_ql in (cc.size_ql(0), cc.size_ql(0) - 1, 4):
        tabs = cc.hybrid_tables(size_ql)
        assert tabs.fused is not None, "fused tables missing on TPU"
        tabs_ref = dataclasses.replace(tabs, fused=None)

        rng = np.random.default_rng(size_ql)
        mods = np.array([int(q) for q in tabs.basis_ql.moduli], np.uint64)
        c2 = jnp.asarray(
            (rng.integers(0, 1 << 62, size=(size_ql, n)).astype(np.uint64)
             % mods[:, None]).astype(np.uint32))

        f0, f1 = hybrid.keyswitch_core(c2, ek, tabs)
        r0, r1 = hybrid.keyswitch_core(c2, ek, tabs_ref)
        ok = (bool(jnp.array_equal(f0, r0)) and bool(jnp.array_equal(f1, r1)))
        print(f"keyswitch_core size_ql={size_ql:2d}: "
              f"{'BIT-EXACT' if ok else 'MISMATCH'}")
        failures += not ok

        # full mult+relin: fused chain vs tensor-product + unfused keyswitch
        a = [jnp.asarray((rng.integers(0, 1 << 62, size=(size_ql, n))
                          .astype(np.uint64) % mods[:, None])
                         .astype(np.uint32)) for _ in range(4)]
        m0, m1 = ks_fused.mult_relin_fused(
            a[0], a[1], a[2], a[3], ek.bv, ek.av, ek.bv_sh, ek.av_sh,
            tabs.fused)
        from openfhe_tpu.math import modops as mo
        bq = tabs.basis_ql
        mm = lambda x, y: mo.mul_mod(x, y, bq.q, bq.r32, bq.r32_sh, bq.m32)
        c0 = mm(a[0], a[2])
        c1 = mo.add_mod(mm(a[0], a[3]), mm(a[1], a[2]), bq.q)
        c2p = mm(a[1], a[3])
        d0, d1 = hybrid.keyswitch_core(c2p, ek, tabs_ref)
        e0 = mo.add_mod(c0, d0, bq.q)
        e1 = mo.add_mod(c1, d1, bq.q)
        ok = (bool(jnp.array_equal(m0, e0)) and bool(jnp.array_equal(m1, e1)))
        print(f"mult_relin     size_ql={size_ql:2d}: "
              f"{'BIT-EXACT' if ok else 'MISMATCH'}")
        failures += not ok

    if failures:
        raise SystemExit(f"{failures} mismatches")
    print("ALL OK")


if __name__ == "__main__":
    main()
