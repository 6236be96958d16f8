"""Per-kernel timing of the fused keyswitch chain at the north-star shape.

Times K1..K6 (ks_fused) standalone so optimization effort goes to the
dominant kernel. Usage: python tools/profile_ks.py
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
    """Amortize dispatch: scan the kernel inside ONE jit with a serial
    data dependency (the tunnel costs ~0.6 ms per eager dispatch)."""
    def step(c, _):
        a0 = args[0].ravel().at[0].add(c).reshape(args[0].shape)
        out = fn(a0, *args[1:])
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf.ravel()[0].astype(args[0].dtype), 0

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
    kqlp = kql + kp_
    print(f"kql={kql} kp={kp_} nd={nd} alpha={alpha} R={r} C={c}")

    rng = np.random.default_rng(0)
    mods = np.asarray(tabs.kq)[:kql].astype(np.uint64)
    x = jnp.asarray(rng.integers(0, 1 << 26, size=(kql, n)).astype(np.uint32))
    x4 = x.reshape(kql, r, c)

    jf = jax.jit

    # K1 standalone (intt_scale over kql towers)
    k1 = jf(lambda v: ks_fused._intt_scale(v, tabs, 0, tabs.bhatinv_q,
                                           tabs.bhatinv_q_sh))
    t = timeit(k1, x4)
    print(f"K1 intt_scale [{kql} towers]      {t*1e3:8.3f} ms")

    # tensor+K1 fused prologue
    k1t = jf(lambda a, b: ks_fused._tensor_intt(a, a, b, b, tabs))
    t = timeit(k1t, x4, x4)
    print(f"K1t tensor_intt [{kql} towers]    {t*1e3:8.3f} ms")

    # K2 conv digits
    y = ks_fused._pad_digits(x, tabs)
    k2 = jf(lambda v: ks_fused._conv_digits(v, tabs))
    t = timeit(k2, y)
    print(f"K2 conv_digits [{nd}x{kqlp}x{nd*alpha}]  {t*1e3:8.3f} ms")

    conv = k2(y)
    conv4 = conv.reshape(nd, kqlp, r, c)
    kfull_p = ek.bv.shape[1]
    bv4 = ek.bv.reshape(nd, kfull_p, r, c)
    av4 = ek.av.reshape(nd, kfull_p, r, c)
    bvsh4 = ek.bv_sh.reshape(nd, kfull_p, r, c)
    avsh4 = ek.av_sh.reshape(nd, kfull_p, r, c)

    # K3
    k3 = jf(lambda cv, c2: ks_fused._ntt_keymul_acc(
        cv, c2, bv4, bvsh4, av4, avsh4, tabs))
    t = timeit(k3, conv4, x4)
    ntts = kqlp * nd - kql
    print(f"K3 ntt_keymul_acc [{ntts} NTTs]    {t*1e3:8.3f} ms")

    ext = k3(conv4, x4)

    # K4
    k4 = jf(lambda e: ks_fused._intt_scale(e, tabs, kql, tabs.pscale,
                                           tabs.pscale_sh, k=kp_,
                                           in_offset=kql))
    t = timeit(k4, ext)
    print(f"K4 intt_scale [2x{kp_} towers]     {t*1e3:8.3f} ms")

    pc = k4(ext)

    # K5
    k5 = jf(lambda v: ks_fused._conv_p_to_q(v.reshape(2, kp_, n), tabs))
    t = timeit(k5, pc)
    print(f"K5 conv_p_to_q                   {t*1e3:8.3f} ms")

    convq = k5(pc)

    # K6
    k6 = jf(lambda cq, e: ks_fused._ntt_subscale(
        cq.reshape(2, kql, r, c), e, tabs))
    t = timeit(k6, convq, ext)
    print(f"K6 ntt_subscale [2x{kql} NTTs]    {t*1e3:8.3f} ms")

    k6f = jf(lambda cq, e, cr: ks_fused._ntt_submul_final(
        cq.reshape(2, kql, r, c), e, x4, x4, cr, cr, tabs))
    t = timeit(k6f, convq, ext, x4)
    print(f"K6f ntt_submul_final             {t*1e3:8.3f} ms")

    # whole chain
    whole = jf(lambda a0, a1, b0, b1: ks_fused.mult_relin_fused(
        a0, a1, b0, b1, ek.bv, ek.av, ek.bv_sh, ek.av_sh, tabs))
    t = timeit(whole, x, x, x, x, iters=10)
    print(f"whole mult_relin_fused           {t*1e3:8.3f} ms"
          f"  ({1.0/t:.1f} ct/s)")


if __name__ == "__main__":
    main()
