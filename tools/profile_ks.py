"""Per-kernel attribution of the fused keyswitch chain at the north-star
shape, by timing PREFIXES of the real mult_relin_fused chain with a
production-style harness.

Two generations of harness proved untrustworthy on the axon platform:
standalone kernel timings sat at a ~0.5-0.9 ms floor regardless of
content, and a scan carry built from at[0].set + a scalar extract added
its own per-iteration cost. This version mirrors bench_north exactly:
an unrolled lax.scan whose carry is two [kql, N] arrays DERIVED from the
last kernel of the prefix (cheap slices + one broadcast add), so every
prefix pays the same glue and the deltas isolate each kernel.

    python tools/profile_ks.py [num_large_digits]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.pke.keyswitch import ks_fused


def time_chain(body, x2, iters=30, reps=3):
    looped = jax.jit(lambda a0, a1: jax.lax.scan(
        lambda cv, _: (body(cv), 0), (a0, a1), None, length=iters,
        unroll=10)[0])
    out = looped(x2, x2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = looped(x2, x2)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * iters)


def main():
    n = 1 << 16
    depth = 30
    nd_req = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=n, mult_depth=depth,
                 scaling_mod_size=26, first_mod_size=27, aux_mod_size=27,
                 num_large_digits=nd_req,
                 security_level=SecurityLevel.HEStd_128_classic,
                 scaling_technique=ScalingTechnique.FIXEDMANUAL)
    cc = GenCryptoContext(p, seed=7)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    tabs = cc.hybrid_tables(cc.size_ql(0)).fused
    ek = cc.eval_mult_keys[kp.secret_key.key_tag]

    kql, kp_, nd, alpha = tabs.kql, tabs.kp, tabs.nd, tabs.alpha
    r, c = tabs.r, tabs.c
    n_ = r * c
    kqlp = kql + kp_
    print(f"kql={kql} kp={kp_} nd={nd} alpha={alpha} R={r} C={c} "
          f"K3_ntts={nd * kqlp - kql}")

    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.integers(0, 1 << 26, size=(kql, n))
                     .astype(np.uint32))

    kfull_p = ek.bv.shape[1]
    key4 = lambda a: a.reshape(-1, kfull_p, r, c)[:nd]
    bv4, av4 = key4(ek.bv), key4(ek.av)
    bvsh4, avsh4 = key4(ek.bv_sh), key4(ek.av_sh)

    def prefix(stages):
        """First `stages` kernels; returns a [kql, N]-pair carry derived
        from the LAST kernel's output."""
        def fn(carry):
            a0, a1 = carry
            a0_4, a1_4 = a0.reshape(kql, r, c), a1.reshape(kql, r, c)
            c2x, y = ks_fused._tensor_intt(a1_4, a1_4, tabs)
            if stages == 1:
                return (y.reshape(kql, n), c2x.reshape(kql, n))
            conv = ks_fused._conv_digits(ks_fused._pad_digits(y, tabs),
                                         tabs)
            if stages == 2:
                c3 = conv.reshape(nd, kqlp, n)
                return (c3[0, :kql], c3[-1, :kql])
            conv4 = conv.reshape(nd, kqlp, r, c)
            ext = ks_fused._ntt_keymul_acc(conv4, c2x, bv4, bvsh4, av4,
                                           avsh4, tabs)
            e3 = ext.reshape(2, kqlp, n)
            if stages == 3:
                return (e3[0, :kql], e3[1, :kql])
            convq = ks_fused._intt_conv_p(ext, tabs)
            if stages == 4:
                return (convq[0], convq[1])
            out = ks_fused._ntt_submul_final(convq.reshape(2, kql, r, c),
                                             ext, a0_4, a1_4, a0_4, a1_4,
                                             tabs)
            return (out[0].reshape(kql, n), out[1].reshape(kql, n))
        return fn

    names = ["K1t tensor_intt", "K2 conv_digits", "K3 ntt_keymul_acc",
             "K45 intt_conv_p", "K6f ntt_submul_final"]
    prev = 0.0
    for s in range(1, 6):
        t = time_chain(prefix(s), x2)
        print(f"prefix K1..{s}: {t*1e3:8.3f} ms   "
              f"+{(t-prev)*1e3:7.3f} ms  <- {names[s-1]}")
        prev = t

    def whole(carry):
        a0, a1 = carry
        return ks_fused.mult_relin_fused(a0, a1, x2, x2, ek.bv, ek.av,
                                         ek.bv_sh, ek.av_sh, tabs)

    t = time_chain(whole, x2)
    print(f"whole mult_relin_fused           {t*1e3:8.3f} ms"
          f"  ({1.0/t:.1f} ct/s)")


if __name__ == "__main__":
    main()
