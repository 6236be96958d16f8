"""Per-kernel timing of the fused mult+relin chain at the bench shape.

Each kernel is timed inside a lax.scan whose iteration CONSUMES the
previous iteration's output (xor-folded into one input), so XLA can
neither hoist nor overlap iterations; per-dispatch tunnel latency is
amortized over ITERS. Run on the TPU: python tools/profile_ks.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.pke.keyswitch import ks_fused as kf

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

tabs = cc.hybrid_tables(cc.size_ql(0)).fused
ek = cc.eval_mult_keys[kp.secret_key.key_tag]
kql, kpp, nd, alpha = tabs.kql, tabs.kp, tabs.nd, tabs.alpha
r, c = tabs.r, tabs.c
kqlp = kql + kpp
kfull_p = ek.bv.shape[1]
print(f"shape: kql={kql} kp={kpp} nd={nd} alpha={alpha} r={r} c={c}",
      flush=True)

rng = np.random.default_rng(0)
mk = lambda *s: jnp.asarray(
    rng.integers(0, 1 << 26, size=s).astype(np.uint32))

a0 = mk(kql, n); a1 = mk(kql, n); b0 = mk(kql, n); b1 = mk(kql, n)
a0_4 = a0.reshape(kql, r, c)
y0 = mk(nd, alpha, n)
conv4 = mk(nd, kqlp, r, c)
ext0 = mk(2, kqlp, r, c)
pc0 = mk(2, kpp, n)
convq0 = mk(2, kql, r, c)

bv4 = ek.bv.reshape(nd, kfull_p, r, c)
av4 = ek.av.reshape(nd, kfull_p, r, c)
bvsh4 = ek.bv_sh.reshape(nd, kfull_p, r, c)
avsh4 = ek.av_sh.reshape(nd, kfull_p, r, c)

ITERS, REPS = 30, 3


def timeit(name, fn, carry0):
    """fn: carry -> carry (same pytree structure), dataflow-dependent."""
    @jax.jit
    def many(carry):
        def body(cv, _):
            return fn(cv), 0
        out, _ = jax.lax.scan(body, cv := carry, None, length=ITERS)
        return out
    o = many(carry0)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(REPS):
        o = many(carry0)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / (REPS * ITERS)
    print(f"{name:32s} {dt*1e3:7.3f} ms", flush=True)
    return dt


def mask26(x):
    return x & jnp.uint32((1 << 26) - 1)


# K1: carry = (a0_4-like); next input = y output (masked to 26 bits)
def k1_step(x):
    c2, cr, y = kf._tensor_intt(x, x, x, x, tabs)
    return mask26(c2 ^ cr ^ y)

t1 = timeit("K1 tensor+intt (3 out)", k1_step, a0_4)


# K2: carry y [nd, alpha, n]; output [nd*kqlp, n] -> slice back
def k2_step(y):
    conv = kf._conv_digits(y, tabs)
    return mask26(conv.reshape(nd, kqlp, n)[:, :alpha, :] ^ y)

t2 = timeit("K2 conv_digits", k2_step, y0)


# K3: carry conv4 [nd, kqlp, r, c]; ext [2, kqlp, r, c] feeds back
def k3_step(cv):
    ext = kf._ntt_keymul_acc(cv, cv[0, :kql], bv4, bvsh4, av4, avsh4, tabs)
    return mask26(cv ^ ext[0][None] ^ ext[1][None])

t3 = timeit("K3 ntt_keymul_acc", k3_step, conv4)


# K4: carry ext [2, kqlp, r, c]; pc [2, kp, r, c] feeds back into P rows
def k4_step(ext):
    pc = kf._intt_scale(ext, tabs, kql, tabs.pscale, tabs.pscale_sh,
                        k=kpp, in_offset=kql)
    upd = ext.at[:, kql:].set(mask26(ext[:, kql:] ^ pc))
    return upd

t4 = timeit("K4 intt_scale(P)", k4_step, ext0)


# K5: carry pc [2, kp, n]; out [2, kql, n] -> fold first kp rows back
def k5_step(pc):
    cq = kf._conv_p_to_q(pc, tabs)
    return mask26(pc ^ cq[:, :kpp, :])

t5 = timeit("K5 conv_p_to_q", k5_step, pc0)


# K6: carry convq [2, kql, r, c] with ext fixed
def k6_step(cq):
    out = kf._ntt_subscale(cq, ext0, tabs)
    return mask26(cq ^ out)

t6 = timeit("K6 ntt_subscale", k6_step, convq0)

total = t1 + t2 + t3 + t4 + t5 + t6
print(f"{'sum of kernels':32s} {total*1e3:7.3f} ms", flush=True)


def full_step(carry):
    x0, x1 = carry
    o0, o1 = kf.mult_relin_fused(x0, x1, x0, x1, ek.bv, ek.av, ek.bv_sh,
                                 ek.av_sh, tabs)
    return (mask26(o0), mask26(o1))

t_all = timeit("full mult_relin_fused", full_step, (a0, a1))
print(f"{'glue (full - sum)':32s} {(t_all-total)*1e3:7.3f} ms", flush=True)
