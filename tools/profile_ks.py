"""Per-kernel attribution of the fused keyswitch chain at the north-star
shape, by timing PREFIXES of the real mult_relin_fused chain.

Standalone kernel timings proved unreliable (they don't sum to the whole
chain: HBM placement and scheduler context differ out-of-chain), so each
kernel's cost is reported as the marginal delta between consecutive chain
prefixes, timed with the same scan harness. Usage:

    python tools/profile_ks.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.pke.keyswitch import ks_fused


def timeit(fn, *args, iters=20, reps=3):
    """Amortize dispatch: scan the prefix inside ONE jit with a serial
    data dependency threaded through the first argument."""
    def step(cv, _):
        a0 = args[0].ravel().at[0].set(cv).reshape(args[0].shape)
        out = fn(a0, *args[1:])
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf.ravel()[0].astype(jnp.uint32), 0

    looped = jax.jit(lambda *a: jax.lax.scan(
        step, jnp.uint32(0), None, length=iters)[0])
    out = looped(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = looped(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * iters)


def main():
    n = 1 << 16
    depth = 30
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=n, mult_depth=depth,
                 scaling_mod_size=26, first_mod_size=27, aux_mod_size=27,
                 security_level=SecurityLevel.HEStd_128_classic,
                 scaling_technique=ScalingTechnique.FIXEDMANUAL)
    cc = GenCryptoContext(p, seed=7)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    tabs_all = cc.hybrid_tables(cc.size_ql(0))
    tabs = tabs_all.fused
    ek = cc.eval_mult_keys[kp.secret_key.key_tag]

    kql, kp_, nd, alpha = tabs.kql, tabs.kp, tabs.nd, tabs.alpha
    r, c = tabs.r, tabs.c
    n_ = r * c
    kqlp = kql + kp_
    print(f"kql={kql} kp={kp_} nd={nd} alpha={alpha} R={r} C={c}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 26, size=(kql, n)).astype(np.uint32))

    kfull_p = ek.bv.shape[1]
    bv4 = ek.bv.reshape(nd, kfull_p, r, c)
    av4 = ek.av.reshape(nd, kfull_p, r, c)
    bvsh4 = ek.bv_sh.reshape(nd, kfull_p, r, c)
    avsh4 = ek.av_sh.reshape(nd, kfull_p, r, c)

    def prefix(stages):
        """The first `stages` kernels of mult_relin_fused (1..6)."""
        def fn(a0, a1, b0, b1):
            a0_4, a1_4 = a0.reshape(kql, r, c), a1.reshape(kql, r, c)
            b0_4, b1_4 = b0.reshape(kql, r, c), b1.reshape(kql, r, c)
            c2x, cross, y = ks_fused._tensor_intt(a0_4, a1_4, b0_4, b1_4,
                                                  tabs)
            if stages == 1:
                return y
            conv = ks_fused._conv_digits(ks_fused._pad_digits(y, tabs), tabs)
            if stages == 2:
                return conv
            conv4 = conv.reshape(nd, kqlp, r, c)
            ext = ks_fused._ntt_keymul_acc(conv4, c2x, bv4, bvsh4, av4,
                                           avsh4, tabs)
            if stages == 3:
                return ext
            pc = ks_fused._intt_scale(ext, tabs, kql, tabs.pscale,
                                      tabs.pscale_sh, k=kp_, in_offset=kql)
            if stages == 4:
                return pc
            convq = ks_fused._conv_p_to_q(pc.reshape(2, kp_, n_), tabs)
            if stages == 5:
                return convq
            return ks_fused._ntt_submul_final(convq.reshape(2, kql, r, c),
                                              ext, a0_4, b0_4, cross, c2x,
                                              tabs)
        return jax.jit(fn)

    names = ["K1t tensor_intt", "K2 conv_digits", "K3 ntt_keymul_acc",
             "K4 intt_scale(P)", "K5 conv_p_to_q", "K6f ntt_submul_final"]
    prev = 0.0
    for s in range(1, 7):
        t = timeit(prefix(s), x, x, x, x)
        print(f"prefix K1..{s}: {t*1e3:8.3f} ms   "
              f"+{(t-prev)*1e3:7.3f} ms  <- {names[s-1]}")
        prev = t

    whole = jax.jit(lambda a0, a1, b0, b1: ks_fused.mult_relin_fused(
        a0, a1, b0, b1, ek.bv, ek.av, ek.bv_sh, ek.av_sh, tabs))
    t = timeit(whole, x, x, x, x)
    print(f"whole mult_relin_fused           {t*1e3:8.3f} ms"
          f"  ({1.0/t:.1f} ct/s)")


if __name__ == "__main__":
    main()
