"""Fused hybrid key switching — the Pallas production path on TPU.

Replaces the XLA-op chain of pke/keyswitch/hybrid.py (still the reference/
CPU path) with six pallas kernel families that keep every intermediate in
VMEM within a grid step and fold the epilogues of SURVEY.md §2.4's promised
"one fused keyswitch kernel" design:

  K1  intt_scale      c2 EVAL -> COEFF, x (B_j/b_i)^{-1} folded per tower
  K2  conv_digits     per-digit base extension as one Karatsuba rowmod
                      matmul into ALL QlP tower rows (own rows zeroed)
  K3  ntt_keymul_acc  per (tower, digit): forward NTT of the extended
                      digit, multiply by the key pair (Shoup, precomputed
                      companions), accumulate over digits — the
                      EvalFastKeySwitchCore inner product with zero HBM
                      intermediates; "own" towers skip the NTT (lax.cond)
                      and multiply the original EVAL slice directly
  K4  intt_scale      ext P-part -> COEFF, x (P/p_i)^{-1} t^{-1} folded
  K5  conv P->Q       Karatsuba rowmod matmul
  K6  ntt_subscale    (x_q - t*NTT(conv)) * P^{-1} — the ApproxModDown
                      epilogue folded into the final NTT's last stage

Reference analogs: keyswitch-hybrid.cpp EvalKeySwitchPrecomputeCore /
EvalFastKeySwitchCore and DCRTPolyImpl::ApproxModDown (dcrtpoly-impl.h).

Engages when the ring is >= 2^14 and every modulus is kara-compatible
(< ~2^27); pke/keyswitch/hybrid.py dispatches here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openfhe_tpu.math import modops as mo
from openfhe_tpu.ops import kara
from openfhe_tpu.ops import ntt_fused as nf


# When True, every pallas_call below runs in interpreter mode — lets CPU
# pytest assert the production kernel chain bit-exact against the XLA
# reference path (tests/test_ks_fused.py), exactly as ops/ntt_fused.py's
# interpret flag does for the NTT kernels. Read at trace time.
INTERPRET = False


def supported(moduli_qlp, ring_dim: int) -> bool:
    return (jax.default_backend() == "tpu" and ring_dim >= nf.MIN_RING_DIM
            and ring_dim & (ring_dim - 1) == 0
            and kara.kara_supported(moduli_qlp))


# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------

@struct.dataclass
class FusedKSTables:
    """Device tables for one ciphertext level."""
    # fused-NTT tables over the Ql*P moduli (fwd + inv weight stacks)
    wr: jnp.ndarray          # [kqlp, 3, 2R, R] int8
    wc: jnp.ndarray          # [kqlp, 6, C, C]
    wri: jnp.ndarray
    wci: jnp.ndarray
    tw: jnp.ndarray          # [kqlp, R, C] uint32
    tw_sh: jnp.ndarray
    twi: jnp.ndarray
    twi_sh: jnp.ndarray
    kq: jnp.ndarray          # [kqlp] uint32 moduli
    km32: jnp.ndarray        # [kqlp]
    kc: jnp.ndarray          # [kqlp, 9]
    kratio: jnp.ndarray      # [kqlp, 9] float32
    r32_q: jnp.ndarray       # [kqlp] 2^32 mod q (+ shoup) for var x var mul
    r32_q_sh: jnp.ndarray
    # K1 epilogue: (B_j/b_i)^{-1} mod b_i per Q tower
    bhatinv_q: jnp.ndarray       # [kql] uint32
    bhatinv_q_sh: jnp.ndarray
    # K4 epilogue: (P/p_i)^{-1} * t^{-1} mod p_i per P tower
    pscale: jnp.ndarray          # [kp]
    pscale_sh: jnp.ndarray
    # K6 epilogue: t mod q_i and P^{-1} mod q_i per Q tower
    t_modq: jnp.ndarray          # [kql]
    t_modq_sh: jnp.ndarray
    pinv_q: jnp.ndarray          # [kql]
    pinv_q_sh: jnp.ndarray
    # K2: digit -> QlP conversion weights as ONE block-diagonal stack
    # (contraction dim nd*alpha instead of alpha: small K dims starve the
    # MXU — measured 2.2x faster than the per-digit matmuls), own rows zero
    conv_w: jnp.ndarray          # [3, 2*nd*kqlp, nd*alpha] int8
    conv_rm_q: jnp.ndarray       # [nd*kqlp, 1] rowmod epilogue consts
    conv_rm_m32: jnp.ndarray
    conv_rm_c: jnp.ndarray       # [9, nd*kqlp, 1]
    conv_rm_ratio: jnp.ndarray
    # K5: P -> Ql conversion
    pconv_w: jnp.ndarray         # [3, 2*kql, kp] int8
    pconv_rm_q: jnp.ndarray      # [kql, 1]
    pconv_rm_m32: jnp.ndarray
    pconv_rm_c: jnp.ndarray
    pconv_rm_ratio: jnp.ndarray
    kql_real: jnp.ndarray = None   # int32 scalar: real tower count (<= kql)
    # statics (kql is the BUCKET size when tables are padded)
    kql: int = struct.field(pytree_node=False, default=0)
    kp: int = struct.field(pytree_node=False, default=0)
    nd: int = struct.field(pytree_node=False, default=0)
    alpha: int = struct.field(pytree_node=False, default=0)
    k_q_full: int = struct.field(pytree_node=False, default=0)
    r: int = struct.field(pytree_node=False, default=0)
    c: int = struct.field(pytree_node=False, default=0)
    t_is_one: bool = struct.field(pytree_node=False, default=True)


def _shoup_np(vals, mods):
    v = np.array([int(x) for x in vals], np.uint64)
    q = np.array([int(x) for x in mods], np.uint64)
    return (v.astype(np.uint32),
            ((v << np.uint64(32)) // q).astype(np.uint32))


@functools.lru_cache(maxsize=None)
def _qlp_ntt_tables(moduli_qlp: tuple, n: int):
    t = nf._fused_tables_np(moduli_qlp, n)
    kc = kara.make_kara_consts(moduli_qlp)
    return t, kc


def bucket_size(size_ql: int, k_q_full: int, step: int = 8) -> int:
    """Shape bucket for a level's tower count (SURVEY 'hard parts' #2:
    rescale drops towers, which would recompile every kernel per level).
    Tables are built at the bucket size with zero padding; a depth-L chain
    then compiles O(#buckets) kernel sets instead of O(L)."""
    return min(k_q_full, -(-size_ql // step) * step)


def make_fused_ks_tables(moduli_q, moduli_p, size_ql: int, num_parts: int,
                         ring_dim: int, k_q_full: int,
                         ns_int: int = 1, pad_to: int | None = None
                         ) -> FusedKSTables:
    """Host precompute (numpy/Python ints) for one level.

    pad_to (>= size_ql, a bucket size): table arrays get `pad_to` Q rows;
    rows/cols beyond the level's real `size_ql` towers are ZERO (conv
    weights, lift inverses, P^-1) or borrowed from the full chain's next
    moduli (NTT tables — the chain-prefix property makes those identical
    for every level in the bucket). Kernels then retrace per bucket, not
    per level; the real tower count rides in `kql_real` (SMEM scalar).
    """
    kb = pad_to or size_ql
    assert size_ql <= kb <= k_q_full
    mq = [int(x) for x in moduli_q[:size_ql]]
    mq_pad = [int(x) for x in moduli_q[:kb]]       # NTT tables need real mods
    mp = [int(x) for x in moduli_p]
    mqlp = mq_pad + mp
    kql, kp = len(mq), len(mp)
    alpha = -(-k_q_full // num_parts)
    nd = min(-(-kql // alpha), num_parts)
    t, kc = _qlp_ntt_tables(tuple(mqlp), ring_dim)

    nd_b = num_parts if kb > kql else nd      # static digit count per bucket

    # K1: per Q tower, digit-local CRT lift inverse (zero on pad rows)
    bhatinv = [0] * kb
    for i, q in enumerate(mq):
        j = min(i // alpha, nd - 1)
        digits = mq[j * alpha:min((j + 1) * alpha, kql)]
        bj = 1
        for b in digits:
            bj *= b
        bhatinv[i] = pow((bj // q) % q, -1, q)
    bh, bh_sh = _shoup_np(bhatinv, mq_pad)

    # K2 conversion weights, block-diagonal over digits:
    # W[j*kqlp + tau, j*alpha + i] = [B_j / b_i]_{q_tau};
    # own rows, pad rows, and digits beyond nd stay zero
    kqlp_b = kb + kp
    wbd = np.zeros((nd_b * kqlp_b, nd_b * alpha), np.uint64)
    for j in range(nd):
        start, end = j * alpha, min((j + 1) * alpha, kql)
        digits = mq[start:end]
        bj = 1
        for b in digits:
            bj *= b
        for tau, qt in enumerate(mqlp):
            if start <= tau < end or (kql <= tau < kb):
                continue                      # own + pad rows stay zero
            for i, b in enumerate(digits):
                wbd[j * kqlp_b + tau, j * alpha + i] = (bj // b) % qt
    conv_w = kara.kara_w_stack_host(wbd)
    rm = kara.make_kara_rowmod_consts(mqlp * nd_b)

    # K4 epilogue: (P/p_i)^{-1} * t^{-1} mod p_i
    big_p = 1
    for p in mp:
        big_p *= p
    pscale = [pow((big_p // p) % p, -1, p) * pow(ns_int % p, -1, p) % p
              for p in mp]
    ps, ps_sh = _shoup_np(pscale, mp)

    # K5: W[row q_i, col p_j] = [P / p_j]_{q_i} (zero on pad rows)
    w5 = np.zeros((kb, kp), np.uint64)
    for i, q in enumerate(mq):
        for jj, p in enumerate(mp):
            w5[i, jj] = (big_p // p) % q
    pconv_w = kara.kara_w_stack_host(w5)
    rm5 = kara.make_kara_rowmod_consts(mq_pad)

    # K6 epilogue: t mod q and P^{-1} mod q (zero on pad rows)
    tq, tq_sh = _shoup_np([ns_int % q for q in mq] + [0] * (kb - kql),
                          mq_pad)
    pinv, pinv_sh = _shoup_np(
        [pow(big_p % q, -1, q) for q in mq] + [0] * (kb - kql), mq_pad)
    r32, r32_sh = _shoup_np([(1 << 32) % q for q in mqlp], mqlp)

    j = jnp.asarray
    return FusedKSTables(
        wr=j(t["wr"]), wc=j(t["wc"]), wri=j(t["wri"]), wci=j(t["wci"]),
        tw=j(t["tw"]), tw_sh=j(t["tw_sh"]), twi=j(t["twi"]),
        twi_sh=j(t["twi_sh"]),
        kq=kc["q"], km32=kc["m32"], kc=kc["c"], kratio=kc["ratio"],
        r32_q=j(r32), r32_q_sh=j(r32_sh),
        bhatinv_q=j(bh), bhatinv_q_sh=j(bh_sh),
        pscale=j(ps), pscale_sh=j(ps_sh),
        t_modq=j(tq), t_modq_sh=j(tq_sh),
        pinv_q=j(pinv), pinv_q_sh=j(pinv_sh),
        conv_w=j(conv_w), conv_rm_q=rm["q"], conv_rm_m32=rm["m32"],
        conv_rm_c=rm["c"], conv_rm_ratio=rm["ratio"],
        pconv_w=j(pconv_w), pconv_rm_q=rm5["q"], pconv_rm_m32=rm5["m32"],
        pconv_rm_c=rm5["c"], pconv_rm_ratio=rm5["ratio"],
        kql_real=jnp.asarray(kql, jnp.int32),
        kql=kb, kp=kp, nd=nd_b, alpha=alpha, k_q_full=k_q_full,
        r=t["r"], c=t["c"], t_is_one=(ns_int == 1))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _smem_specs(n: int):
    return [pl.BlockSpec(memory_space=pltpu.SMEM)] * n


def _w_spec(shape_tail, index):
    return pl.BlockSpec((1,) + shape_tail, index, memory_space=pltpu.VMEM)


def _consts_pack(tabs):
    return (tabs.kq, tabs.km32, tabs.kc, tabs.kratio)


def _recomb(ps, tau, q_ref, m32_ref, c_ref, ratio_ref, canonical=True):
    cv = [c_ref[tau, i] for i in range(kara.NSRC)]
    rv = [ratio_ref[tau, i] for i in range(kara.NSRC)]
    return kara.kara_recombine(ps, q_ref[tau], cv, rv, m32_ref[tau],
                               canonical=canonical)


def _fwd_core(x, tau, wr, wc, tw, twsh, q_ref, m32_ref, c_ref, ratio_ref,
              lazy_out=False):
    """Stage-1 recombine is always lazy (feeds the twiddle Shoup multiply);
    lazy_out leaves stage 2 biased < 32q for callers whose next op is a
    Shoup constant-multiply (see kara.kara_recombine)."""
    s1 = _recomb(nf._kara_nn(wr, x), tau, q_ref, m32_ref, c_ref, ratio_ref,
                 canonical=False)
    s2 = mo.mul_mod_shoup_fast(s1, tw, twsh, q_ref[tau])
    return _recomb(nf._kara_nt(s2, wc), tau, q_ref, m32_ref, c_ref, ratio_ref,
                   canonical=not lazy_out)


def _inv_core(y, tau, wci, wri, twi, twish, q_ref, m32_ref, c_ref, ratio_ref,
              lazy_out=False):
    s2t = _recomb(nf._kara_nt(y, wci), tau, q_ref, m32_ref, c_ref, ratio_ref,
                  canonical=False)
    s1 = mo.mul_mod_shoup_fast(s2t, twi, twish, q_ref[tau])
    return _recomb(nf._kara_nn(wri, s1), tau, q_ref, m32_ref, c_ref, ratio_ref,
                   canonical=not lazy_out)


def _tensor_intt_single(a1_4, b1_4, tabs: FusedKSTables):
    """One-tower-per-step variant of _tensor_intt (fallback for odd local
    tower counts in sharded table views)."""
    kql = tabs.kql
    r, c = tabs.r, tabs.c

    def kern(q_ref, m32_ref, c_ref, ratio_ref, r32_ref, r32sh_ref,
             sc_ref, scsh_ref, wci_ref, wri_ref, twi_ref, twish_ref,
             a1_ref, b1_ref, c2_ref, y_ref):
        i = pl.program_id(0)
        q = q_ref[i]
        c2 = mo.mul_mod(a1_ref[0], b1_ref[0], q, r32_ref[i], r32sh_ref[i],
                        m32_ref[i])
        c2_ref[0] = c2
        v = _inv_core(c2, i, wci_ref[0], wri_ref[0], twi_ref[0],
                      twish_ref[0], q_ref, m32_ref, c_ref, ratio_ref,
                      lazy_out=True)
        y_ref[0] = mo.mul_mod_shoup_fast(v, sc_ref[i], scsh_ref[i], q)

    return pl.pallas_call(
        kern,
        grid=(kql,),
        in_specs=_smem_specs(8) + [
            _w_spec((kara.KARA_GROUPS, 2 * c, c), lambda i: (i, 0, 0, 0)),
            _w_spec((kara.KARA_GROUPS, 2 * r, r), lambda i: (i, 0, 0, 0)),
            _w_spec((r, c), lambda i: (i, 0, 0)),
            _w_spec((r, c), lambda i: (i, 0, 0)),
            _w_spec((r, c), lambda i: (i, 0, 0)),
            _w_spec((r, c), lambda i: (i, 0, 0)),
        ],
        out_specs=(_w_spec((r, c), lambda i: (i, 0, 0)),
                   _w_spec((r, c), lambda i: (i, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((kql, r, c), jnp.uint32),
                   jax.ShapeDtypeStruct((kql, r, c), jnp.uint32)),
        interpret=INTERPRET,
    )(tabs.kq, tabs.km32, tabs.kc, tabs.kratio, tabs.r32_q, tabs.r32_q_sh,
      tabs.bhatinv_q, tabs.bhatinv_q_sh,
      tabs.wci, tabs.wri, tabs.twi, tabs.twi_sh,
      a1_4, b1_4)


def _tensor_intt(a1_4, b1_4, tabs: FusedKSTables):
    """Fused tensor-product + K1 for mult+relin — slim I/O, tower PAIRS.

    Per grid step: TWO Q towers' c2 = a1*b1 and y = INTT(c2)*bhatinv.
    Round-5 measurements (PERF.md): 1-transform-per-step shells pay
    ~13 us/transform while K6f's 2-per-step gets 3.7 — the pairing lets
    one tower's MXU stages run under the other's VPU epilogue. c0/cross/
    c1 are recomputed in the K6 epilogue (reference flow:
    rns-leveledshe.cpp EvalMultCore + base-leveledshe.cpp relinearize).

    For odd kql the last pair's second slot computes a garbage transform
    against the first P tower's tables (row kql exists in the QlP sets);
    callers slice outputs to [:kql]."""
    kql = tabs.kql
    r, c = tabs.r, tabs.c
    kk = kql + (kql & 1)                   # even padded row count
    if kk > kql and not (tabs.kq.shape[0] > kql
                         and tabs.r32_q.shape[0] > kql
                         and tabs.wci.shape[0] > kql):
        # odd tower count without a spare QlP row to lean on (sharded
        # local table views): single-tower fallback
        return _tensor_intt_single(a1_4, b1_4, tabs)
    if kk > kql:
        pad = jnp.zeros((1, r, c), jnp.uint32)
        a1_4 = jnp.concatenate([a1_4, pad], axis=0)
        b1_4 = jnp.concatenate([b1_4, pad], axis=0)

    def kern(q_ref, m32_ref, c_ref, ratio_ref, r32_ref, r32sh_ref,
             sc_ref, scsh_ref, wci_ref, wri_ref, twi_ref, twish_ref,
             a1_ref, b1_ref, c2_ref, y_ref):
        i = pl.program_id(0)
        for t in range(2):
            tau = 2 * i + t
            q = q_ref[tau]
            c2 = mo.mul_mod(a1_ref[t], b1_ref[t], q, r32_ref[tau],
                            r32sh_ref[tau], m32_ref[tau])
            c2_ref[t] = c2
            v = _inv_core(c2, tau, wci_ref[t], wri_ref[t], twi_ref[t],
                          twish_ref[t], q_ref, m32_ref, c_ref, ratio_ref,
                          lazy_out=True)
            s = jnp.minimum(tau, kql - 1)       # bhatinv has kql rows
            y_ref[t] = mo.mul_mod_shoup_fast(v, sc_ref[s], scsh_ref[s], q)

    c2x, y = pl.pallas_call(
        kern,
        grid=(kk // 2,),
        in_specs=_smem_specs(8) + [
            pl.BlockSpec((2, kara.KARA_GROUPS, 2 * c, c),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, kara.KARA_GROUPS, 2 * r, r),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, r, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, r, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, r, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, r, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((2, r, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((2, r, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((kk, r, c), jnp.uint32),
                   jax.ShapeDtypeStruct((kk, r, c), jnp.uint32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(tabs.kq, tabs.km32, tabs.kc, tabs.kratio, tabs.r32_q, tabs.r32_q_sh,
      tabs.bhatinv_q, tabs.bhatinv_q_sh,
      tabs.wci, tabs.wri, tabs.twi, tabs.twi_sh,
      a1_4, b1_4)
    return c2x[:kql], y[:kql]


def _intt_scale_pairs(x4, tabs: FusedKSTables, scale, scale_sh):
    """Tower-paired INTT + constant multiply for the Q rows (the
    rotation-path K1): two transforms per grid step, same rationale as
    _tensor_intt. x4 [kql, R, C] -> [kql, R, C] COEFF."""
    kql = tabs.kql
    r, c = tabs.r, tabs.c
    kk = kql + (kql & 1)
    if kk > kql:
        x4 = jnp.concatenate(
            [x4, jnp.zeros((1, r, c), jnp.uint32)], axis=0)

    def kern(q_ref, m32_ref, c_ref, ratio_ref, sc_ref, scsh_ref,
             wci_ref, wri_ref, twi_ref, twish_ref, x_ref, o_ref):
        i = pl.program_id(0)
        for t in range(2):
            tau = 2 * i + t
            v = _inv_core(x_ref[t], tau, wci_ref[t], wri_ref[t],
                          twi_ref[t], twish_ref[t],
                          q_ref, m32_ref, c_ref, ratio_ref, lazy_out=True)
            s = jnp.minimum(tau, kql - 1)
            o_ref[t] = mo.mul_mod_shoup_fast(v, sc_ref[s], scsh_ref[s],
                                             q_ref[tau])

    out = pl.pallas_call(
        kern,
        grid=(kk // 2,),
        in_specs=_smem_specs(6) + [
            pl.BlockSpec((2, kara.KARA_GROUPS, 2 * c, c),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, kara.KARA_GROUPS, 2 * r, r),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, r, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, r, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, r, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, r, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kk, r, c), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(tabs.kq, tabs.km32, tabs.kc, tabs.kratio, scale, scale_sh,
      tabs.wci, tabs.wri, tabs.twi, tabs.twi_sh, x4)
    return out[:kql]


def _intt_scale(x4, tabs: FusedKSTables, tower_offset: int, scale, scale_sh,
                k: int | None = None, in_offset: int = 0):
    """INTT + per-tower constant multiply. x4 [..., k + in_offset, R, C]
    (tower rows starting at `tower_offset` in the QlP table set and at
    `in_offset` in the input — lets K4 read ext's P rows in place with no
    XLA slice); an optional leading element axis runs INSIDE each grid
    step (one weight fetch per tower, K6-merge style — measured faster
    than batching the element axis through the grid). Returns
    [..., k, R, C] COEFF."""
    r, c = tabs.r, tabs.c
    lead = x4.shape[:-3]
    rep = int(np.prod(lead)) if lead else 1
    k = k if k is not None else x4.shape[-3]
    x4 = x4.reshape(rep, x4.shape[-3], r, c)

    def kern(q_ref, m32_ref, c_ref, ratio_ref, sc_ref, scsh_ref,
             wci_ref, wri_ref, twi_ref, twish_ref, x_ref, o_ref):
        i = pl.program_id(0)
        tau = i + tower_offset
        for e in range(rep):
            v = _inv_core(x_ref[e, 0], tau, wci_ref[0], wri_ref[0],
                          twi_ref[0], twish_ref[0],
                          q_ref, m32_ref, c_ref, ratio_ref, lazy_out=True)
            o_ref[e, 0] = mo.mul_mod_shoup_fast(v, sc_ref[i], scsh_ref[i],
                                                q_ref[tau])

    off = tower_offset
    ioff = in_offset
    out = pl.pallas_call(
        kern,
        grid=(k,),
        in_specs=_smem_specs(6) + [
            _w_spec((kara.KARA_GROUPS, 2 * c, c),
                    lambda i: (i + off, 0, 0, 0)),
            _w_spec((kara.KARA_GROUPS, 2 * r, r),
                    lambda i: (i + off, 0, 0, 0)),
            _w_spec((r, c), lambda i: (i + off, 0, 0)),
            _w_spec((r, c), lambda i: (i + off, 0, 0)),
            pl.BlockSpec((rep, 1, r, c), lambda i: (0, i + ioff, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rep, 1, r, c), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rep, k, r, c), jnp.uint32),
        interpret=INTERPRET,
    )(tabs.kq, tabs.km32, tabs.kc, tabs.kratio, scale, scale_sh,
      tabs.wci, tabs.wri, tabs.twi, tabs.twi_sh, x4)
    return out.reshape(lead + (k, r, c)) if lead else out[0]


def _conv_digits(y_pad, tabs: FusedKSTables, tile_b: int = 4096):
    """K2: y_pad [nd, alpha, N] COEFF -> conv [nd, kqlp, N] COEFF, as one
    block-diagonal Karatsuba rowmod matmul over all digits (K = nd*alpha)."""
    nd, alpha, nb = y_pad.shape
    kqlp = tabs.kql + tabs.kp
    rows = nd * kqlp
    tb = min(tile_b, nb)

    def kern(w_ref, rq_ref, rm32_ref, rc_ref, rratio_ref, x_ref, o_ref):
        ps = nf._kara_nn(w_ref[...], x_ref[...])
        cv = [rc_ref[i] for i in range(kara.NSRC)]
        rv = [rratio_ref[i] for i in range(kara.NSRC)]
        o_ref[...] = kara.kara_recombine(ps, rq_ref[...], cv, rv,
                                         rm32_ref[...])

    out = pl.pallas_call(
        kern,
        grid=(nb // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w [3, 2*rows, nd*alpha]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rowmod q [rows, 1]
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c [9, rows, 1]
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((nd * alpha, tb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, tb), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, nb), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(tabs.conv_w, tabs.conv_rm_q, tabs.conv_rm_m32, tabs.conv_rm_c,
      tabs.conv_rm_ratio, y_pad.reshape(nd * alpha, nb))
    return out.reshape(nd, kqlp, nb)


def _conv_p_to_q(p_coeff, tabs: FusedKSTables, tile_b: int = 4096):
    """K5: p_coeff [2, kp, N] -> [2, kql, N] (both elements batched)."""
    ne, kp, nb = p_coeff.shape
    kql = tabs.kql
    tb = min(tile_b, nb)

    def kern(w_ref, rq_ref, rm32_ref, rc_ref, rratio_ref, x_ref, o_ref):
        ps = nf._kara_nn(w_ref[...], x_ref[0])
        cv = [rc_ref[i] for i in range(kara.NSRC)]
        rv = [rratio_ref[i] for i in range(kara.NSRC)]
        o_ref[0] = kara.kara_recombine(ps, rq_ref[...], cv, rv,
                                       rm32_ref[...])

    return pl.pallas_call(
        kern,
        grid=(ne, nb // tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, tb), lambda e, b: (e, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kql, tb), lambda e, b: (e, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ne, kql, nb), jnp.uint32),
        interpret=INTERPRET,
    )(tabs.pconv_w, tabs.pconv_rm_q, tabs.pconv_rm_m32, tabs.pconv_rm_c,
      tabs.pconv_rm_ratio, p_coeff)


def _intt_conv_p(ext, tabs: FusedKSTables, tile_b: int = 4096):
    """K4+K5 fused: INTT+scale the P rows of ext into persistent VMEM
    scratch (first kp grid steps, both elements), then the P->Ql Karatsuba
    rowmod matmul per (element, column tile) — the round-4 profile's
    "fold K4+K5" lever (PERF.md): the [2, kp, N] COEFF intermediate never
    round-trips HBM and one kernel dispatch replaces two.

    ext [2, kqlp, R, C] EVAL -> [2, kql, N] COEFF (= old K5 output)."""
    kql, kp = tabs.kql, tabs.kp
    r, c = tabs.r, tabs.c
    n = r * c
    tb = min(tile_b, n)
    nb_t = n // tb
    rpt = tb // c                      # scratch rows per column tile

    def kern(q_ref, m32_ref, c_ref, ratio_ref, sc_ref, scsh_ref,
             rq_ref, rm32_ref, rc_ref, rratio_ref, w_ref,
             wci_ref, wri_ref, twi_ref, twish_ref, x_ref, o_ref, pc_ref):
        s = pl.program_id(0)

        @pl.when(s < kp)
        def _():
            tau = s + kql
            for e in range(2):
                v = _inv_core(x_ref[e, 0], tau, wci_ref[0], wri_ref[0],
                              twi_ref[0], twish_ref[0],
                              q_ref, m32_ref, c_ref, ratio_ref,
                              lazy_out=True)
                pc_ref[e, s] = mo.mul_mod_shoup_fast(
                    v, sc_ref[s], scsh_ref[s], q_ref[tau])

        @pl.when(s >= kp)
        def _():
            e = (s - kp) // nb_t
            b = (s - kp) % nb_t
            xm = pc_ref[e, :, pl.ds(b * rpt, rpt), :].reshape(kp, tb)
            ps = nf._kara_nn(w_ref[...], xm)
            cv = [rc_ref[i] for i in range(kara.NSRC)]
            rv = [rratio_ref[i] for i in range(kara.NSRC)]
            o_ref[0] = kara.kara_recombine(ps, rq_ref[...], cv, rv,
                                           rm32_ref[...])

    def x_row(s):
        return (0, kql + jnp.minimum(s, kp - 1), 0, 0)

    def o_idx(s):
        past = jnp.maximum(s - kp, 0)
        return (jnp.clip(past // nb_t, 0, 1), 0, past % nb_t)

    return pl.pallas_call(
        kern,
        grid=(kp + 2 * nb_t,),
        in_specs=_smem_specs(6) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rowmod q [kql, 1]
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c [9, kql, 1]
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w [3, 2*kql, kp]
            _w_spec((kara.KARA_GROUPS, 2 * c, c),
                    lambda s: (kql + jnp.minimum(s, kp - 1), 0, 0, 0)),
            _w_spec((kara.KARA_GROUPS, 2 * r, r),
                    lambda s: (kql + jnp.minimum(s, kp - 1), 0, 0, 0)),
            _w_spec((r, c), lambda s: (kql + jnp.minimum(s, kp - 1), 0, 0)),
            _w_spec((r, c), lambda s: (kql + jnp.minimum(s, kp - 1), 0, 0)),
            pl.BlockSpec((2, 1, r, c), x_row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kql, tb), o_idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, kql, n), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((2, kp, r, c), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(tabs.kq, tabs.km32, tabs.kc, tabs.kratio,
      tabs.pscale, tabs.pscale_sh,
      tabs.pconv_rm_q, tabs.pconv_rm_m32, tabs.pconv_rm_c,
      tabs.pconv_rm_ratio, tabs.pconv_w,
      tabs.wci, tabs.wri, tabs.twi, tabs.twi_sh, ext)


def _ntt_keymul_acc(conv4, c2_4, bv4, bvsh4, av4, avsh4,
                    tabs: FusedKSTables):
    """K3: returns ext [2, kqlp, R, C] EVAL (elements stacked).

    The digit loop runs INSIDE each grid step (K6-merge style): one NTT
    weight fetch per tower, register accumulation over digits instead of
    a read-modify-write of the output block per digit."""
    kql, kp, nd, alpha = tabs.kql, tabs.kp, tabs.nd, tabs.alpha
    kqlp = kql + kp
    r, c = tabs.r, tabs.c
    kfull = tabs.k_q_full

    def key_row(tau):
        return (0, jnp.where(tau >= kql, tau + (kfull - kql), tau), 0, 0)

    def kern(q_ref, m32_ref, c_ref, ratio_ref, kqlr_ref,
             wr_ref, wc_ref, tw_ref, twsh_ref,
             conv_ref, c2_ref, bv_ref, bvsh_ref, av_ref, avsh_ref,
             o0_ref):
        tau = pl.program_id(0)
        q = q_ref[tau]
        acc0 = acc1 = None
        for j in range(nd):
            # real tower count is an SMEM scalar so every level in a
            # shape bucket shares one compiled kernel
            end_j = jnp.minimum((j + 1) * alpha, kqlr_ref[0])
            own = jnp.logical_and(tau >= j * alpha, tau < end_j)
            s = jax.lax.cond(
                own,
                lambda: c2_ref[0],
                lambda j=j: _fwd_core(conv_ref[j, 0], tau, wr_ref[0],
                                      wc_ref[0], tw_ref[0], twsh_ref[0],
                                      q_ref, m32_ref, c_ref, ratio_ref,
                                      lazy_out=True))
            t0 = mo.mul_mod_shoup_fast(s, bv_ref[j, 0], bvsh_ref[j, 0], q)
            t1 = mo.mul_mod_shoup_fast(s, av_ref[j, 0], avsh_ref[j, 0], q)
            acc0 = t0 if acc0 is None else mo.add_mod(acc0, t0, q)
            acc1 = t1 if acc1 is None else mo.add_mod(acc1, t1, q)
        o0_ref[0, 0] = acc0
        o0_ref[1, 0] = acc1

    ext = pl.pallas_call(
        kern,
        grid=(kqlp,),
        in_specs=_smem_specs(5) + [
            _w_spec((kara.KARA_GROUPS, 2 * r, r),
                    lambda tau: (tau, 0, 0, 0)),
            _w_spec((kara.KARA_GROUPS, 2 * c, c),
                    lambda tau: (tau, 0, 0, 0)),
            _w_spec((r, c), lambda tau: (tau, 0, 0)),
            _w_spec((r, c), lambda tau: (tau, 0, 0)),
            pl.BlockSpec((nd, 1, r, c), lambda tau: (0, tau, 0, 0),
                         memory_space=pltpu.VMEM),
            _w_spec((r, c),
                    lambda tau: (jnp.minimum(tau, kql - 1), 0, 0)),
            pl.BlockSpec((nd, 1, r, c), key_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, 1, r, c), key_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, 1, r, c), key_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, 1, r, c), key_row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, r, c), lambda tau: (0, tau, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, kqlp, r, c), jnp.uint32),
        interpret=INTERPRET,
    )(tabs.kq, tabs.km32, tabs.kc, tabs.kratio,
      tabs.kql_real.reshape(1),
      tabs.wr, tabs.wc, tabs.tw, tabs.tw_sh,
      conv4, c2_4, bv4, bvsh4, av4, avsh4)
    return ext


def _ntt_subscale(convq4, ext, tabs: FusedKSTables):
    """K6, both elements: out[e] = (ext[e, :kql] - t*NTT(convq[e])) * P^{-1}.

    convq4 [2, kql, R, C] COEFF; ext [2, kqlp, R, C] EVAL.
    Grid is per tower with both elements in one step (NTT weights loaded
    once). Returns [2, kql, R, C] EVAL."""
    kql = tabs.kql
    r, c = tabs.r, tabs.c
    t_is_one = tabs.t_is_one

    def kern(q_ref, m32_ref, c_ref, ratio_ref, tq_ref, tqsh_ref,
             pv_ref, pvsh_ref, wr_ref, wc_ref, tw_ref, twsh_ref,
             x_ref, xq_ref, o_ref):
        tau = pl.program_id(0)
        q = q_ref[tau]
        for e in range(2):
            # with t != 1, the t-multiply (Shoup) canonicalizes a lazy
            # NTT output
            s = _fwd_core(x_ref[e, 0], tau, wr_ref[0], wc_ref[0],
                          tw_ref[0], twsh_ref[0], q_ref, m32_ref, c_ref,
                          ratio_ref, lazy_out=not t_is_one)
            if not t_is_one:
                s = mo.mul_mod_shoup_fast(s, tq_ref[tau], tqsh_ref[tau], q)
            d = mo.sub_mod(xq_ref[e, 0], s, q)
            o_ref[e, 0] = mo.mul_mod_shoup_fast(d, pv_ref[tau],
                                                pvsh_ref[tau], q)

    return pl.pallas_call(
        kern,
        grid=(kql,),
        in_specs=_smem_specs(8) + [
            _w_spec((kara.KARA_GROUPS, 2 * r, r), lambda i: (i, 0, 0, 0)),
            _w_spec((kara.KARA_GROUPS, 2 * c, c), lambda i: (i, 0, 0, 0)),
            _w_spec((r, c), lambda i: (i, 0, 0)),
            _w_spec((r, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, 1, r, c), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, r, c), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, r, c), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, kql, r, c), jnp.uint32),
        interpret=INTERPRET,
    )(tabs.kq, tabs.km32, tabs.kc, tabs.kratio,
      tabs.t_modq, tabs.t_modq_sh, tabs.pinv_q, tabs.pinv_q_sh,
      tabs.wr, tabs.wc, tabs.tw, tabs.tw_sh, convq4, ext)


def _ntt_submul_final(convq4, ext, a0_4, a1_4, b0_4, b1_4,
                      tabs: FusedKSTables):
    """K6 variant ending a full mult+relin: per tower (both elements in
    one grid step — the tensor terms and the NTT weights are shared):
        d_e = (ext[e] - NTT(convq[e])) * P^{-1}          (ApproxModDown)
        c0  = a0*b0;  c2 = a1*b1;  c1 = (a0+a1)(b0+b1) - c0 - c2
        out = (c0 + d_0, c1 + d_1)
    The whole tensor product lives here (and c2 in K1t) so K1t stays
    2-in/2-out — its old 4-in/3-out structure was 32% of the chain
    (PERF.md). Returns [2, kql, R, C] EVAL."""
    kql = tabs.kql
    r, c = tabs.r, tabs.c

    def kern(q_ref, m32_ref, c_ref, ratio_ref, r32_ref, r32sh_ref,
             pv_ref, pvsh_ref, wr_ref, wc_ref, tw_ref, twsh_ref,
             x_ref, xq_ref, a0_ref, a1_ref, b0_ref, b1_ref, o_ref):
        tau = pl.program_id(0)
        q = q_ref[tau]
        mm = lambda x, y: mo.mul_mod(x, y, q, r32_ref[tau],
                                     r32sh_ref[tau], m32_ref[tau])
        a0, a1 = a0_ref[0], a1_ref[0]
        b0, b1 = b0_ref[0], b1_ref[0]
        c0 = mm(a0, b0)
        c2 = mm(a1, b1)
        cross = mm(mo.add_mod(a0, a1, q), mo.add_mod(b0, b1, q))
        c1 = mo.sub_mod(mo.sub_mod(cross, c0, q), c2, q)
        for e, base in ((0, c0), (1, c1)):
            s = _fwd_core(x_ref[e, 0], tau, wr_ref[0], wc_ref[0], tw_ref[0],
                          twsh_ref[0], q_ref, m32_ref, c_ref, ratio_ref)
            d = mo.sub_mod(xq_ref[e, 0], s, q)
            d = mo.mul_mod_shoup_fast(d, pv_ref[tau], pvsh_ref[tau], q)
            o_ref[e, 0] = mo.add_mod(base, d, q)

    return pl.pallas_call(
        kern,
        grid=(kql,),
        in_specs=_smem_specs(8) + [
            _w_spec((kara.KARA_GROUPS, 2 * r, r), lambda i: (i, 0, 0, 0)),
            _w_spec((kara.KARA_GROUPS, 2 * c, c), lambda i: (i, 0, 0, 0)),
            _w_spec((r, c), lambda i: (i, 0, 0)),
            _w_spec((r, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, 1, r, c), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, r, c), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            _w_spec((r, c), lambda i: (i, 0, 0)),
            _w_spec((r, c), lambda i: (i, 0, 0)),
            _w_spec((r, c), lambda i: (i, 0, 0)),
            _w_spec((r, c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, 1, r, c), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, kql, r, c), jnp.uint32),
        interpret=INTERPRET,
    )(tabs.kq, tabs.km32, tabs.kc, tabs.kratio, tabs.r32_q, tabs.r32_q_sh,
      tabs.pinv_q, tabs.pinv_q_sh,
      tabs.wr, tabs.wc, tabs.tw, tabs.tw_sh,
      convq4, ext, a0_4, a1_4, b0_4, b1_4)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def keyswitch_core_fused(c2: jnp.ndarray, bv, av, bv_sh, av_sh,
                         tabs: FusedKSTables):
    """Full fused KeySwitchCore: c2 [kql, N] EVAL -> (d0, d1) [kql, N] EVAL.

    bv/av: [nd, k_q_full + kp, N] eval key halves; *_sh their Shoup
    companions (precomputed at keygen).
    """
    kql, kp, nd, alpha = tabs.kql, tabs.kp, tabs.nd, tabs.alpha
    r, c = tabs.r, tabs.c
    n = r * c
    kqlp = kql + kp

    kreal = c2.shape[0]
    if kreal < kql:                 # bucketed tables: zero-pad to bucket
        c2 = jnp.concatenate(
            [c2, jnp.zeros((kql - kreal, n), jnp.uint32)], axis=0)
    c2_4 = c2.reshape(kql, r, c)
    # K1: INTT + digit-local lift inverse (tower pairs when the table set
    # has a spare QlP row for odd kql)
    if (kql % 2 == 0) or (tabs.kq.shape[0] > kql
                          and tabs.wci.shape[0] > kql):
        y = _intt_scale_pairs(c2_4, tabs, tabs.bhatinv_q,
                              tabs.bhatinv_q_sh)
    else:
        y = _intt_scale(c2_4, tabs, 0, tabs.bhatinv_q, tabs.bhatinv_q_sh)
    # K2: extend every digit to the full QlP basis
    conv = _conv_digits(_pad_digits(y, tabs), tabs)     # [nd, kqlp, N]
    conv4 = conv.reshape(nd, kqlp, r, c)
    # K3: NTT + key inner product, accumulated over digits. Keys carry
    # num_large_digits rows; shallow levels may use fewer digits (nd < key
    # rows) — the extra digits' towers are empty, so slice them off.
    kfull_p = bv.shape[1]
    bv4 = bv.reshape(-1, kfull_p, r, c)[:nd]
    av4 = av.reshape(-1, kfull_p, r, c)[:nd]
    bvsh4 = bv_sh.reshape(-1, kfull_p, r, c)[:nd]
    avsh4 = av_sh.reshape(-1, kfull_p, r, c)[:nd]
    ext = _ntt_keymul_acc(conv4, c2_4, bv4, bvsh4, av4, avsh4, tabs)
    # K4+K5 fused: ApproxModDown's P-part INTT feeds the P->Q conversion
    # entirely in VMEM
    convq = _intt_conv_p(ext, tabs)                     # [2, kql, N]
    out = _ntt_subscale(convq.reshape(2, kql, r, c), ext, tabs)
    return (out[0].reshape(kql, n)[:kreal],
            out[1].reshape(kql, n)[:kreal])


def _pad_digits(y, tabs: FusedKSTables):
    kql, nd, alpha = tabs.kql, tabs.nd, tabs.alpha
    n = tabs.r * tabs.c
    y2 = y.reshape(kql, n)
    pad = nd * alpha - kql
    if pad:
        y2 = jnp.concatenate([y2, jnp.zeros((pad, n), jnp.uint32)], axis=0)
    return y2.reshape(nd, alpha, n)


def mult_relin_fused(a0, a1, b0, b1, bv, av, bv_sh, av_sh,
                     tabs: FusedKSTables):
    """Whole CKKS/BGV mult+relinearize as one kernel chain.

    Inputs [kql, N] EVAL; returns (o0, o1) [kql, N] EVAL with
    o = tensor(a, b) relinearized. The tensor product rides K1's prologue
    and the final additions ride K6's epilogue, so no elementwise XLA
    passes remain (reference flow: rns-leveledshe.cpp EvalMult +
    keyswitch-hybrid.cpp KeySwitchCore)."""
    kql, kp, nd = tabs.kql, tabs.kp, tabs.nd
    r, c = tabs.r, tabs.c
    n = r * c
    kqlp = kql + kp
    kreal = a0.shape[0]
    if kreal < kql:                 # bucketed tables: zero-pad to bucket
        def _pad(x):
            return jnp.concatenate(
                [x, jnp.zeros((kql - kreal, n), jnp.uint32)], axis=0)
        a0, a1, b0, b1 = _pad(a0), _pad(a1), _pad(b0), _pad(b1)
    a0_4, a1_4 = a0.reshape(kql, r, c), a1.reshape(kql, r, c)
    b0_4, b1_4 = b0.reshape(kql, r, c), b1.reshape(kql, r, c)
    c2x, y = _tensor_intt(a1_4, b1_4, tabs)
    conv = _conv_digits(_pad_digits(y, tabs), tabs)
    conv4 = conv.reshape(nd, kqlp, r, c)
    kfull_p = bv.shape[1]
    ext = _ntt_keymul_acc(conv4, c2x,
                          bv.reshape(-1, kfull_p, r, c)[:nd],
                          bv_sh.reshape(-1, kfull_p, r, c)[:nd],
                          av.reshape(-1, kfull_p, r, c)[:nd],
                          av_sh.reshape(-1, kfull_p, r, c)[:nd], tabs)
    convq = _intt_conv_p(ext, tabs)
    out = _ntt_submul_final(convq.reshape(2, kql, r, c), ext,
                            a0_4, a1_4, b0_4, b1_4, tabs)
    return (out[0].reshape(kql, n)[:kreal],
            out[1].reshape(kql, n)[:kreal])
