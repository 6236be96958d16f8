"""Limb-axis-sharded mult+relinearize running the PRODUCTION Pallas
kernels on each device's local tower rows (SURVEY §2.4/§7.11 end state;
round-3 verdict missing point 5: parallel/sharded.py's VPU body meant a
real mesh ran mult+relin at unfused speed).

Same communication pattern as parallel/sharded.py (which remains the
portable any-backend body): every per-tower kernel is local; the two RNS
base-conversion mixing points are `all_gather`s over the "limb" axis:

  K1t  _tensor_intt        local Q rows            (ks_fused kernel as-is)
       -- all_gather y, c2 --
  K2   _conv_digits_rows   local QlP rows x all digits (row-sharded stack)
  K3   _ntt_keymul_acc_sh  local QlP rows, own-rows via an SMEM mask
       -- all_gather ext --
  K4   _intt_scale         P rows (replicated: kp is small)
  K5   _conv_p_to_q_rows   local Q rows
  K6f  _ntt_submul_final   local Q rows            (ks_fused kernel as-is)

Tables are the global fused tables RE-LAID-OUT so every sharded axis is a
leading row axis (Q-layout kql/L rows, QlP-layout kqlp/L rows); kernels
index rows locally, so one traced program serves every device.

Requires kql % limb == 0 and kqlp % limb == 0 (size the chain to the
mesh), kara-compatible moduli, and ns_int == 1 (CKKS; the BGV t-multiply
branch stays on the portable body). Set ks_fused.INTERPRET for CPU-mesh
validation (tests/test_sharded_fused.py, __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from openfhe_tpu.math import modops as mo
from openfhe_tpu.ops import kara
from openfhe_tpu.ops import ntt_fused as nf
from openfhe_tpu.pke.keyswitch import ks_fused


@struct.dataclass
class ShardedFusedTables:
    """Fused-kernel tables laid out for limb-axis sharding."""
    # ---- Q-layout: row axis length kql, sharded in kql/L blocks ----
    q_kq: jnp.ndarray
    q_km32: jnp.ndarray
    q_kc: jnp.ndarray
    q_kratio: jnp.ndarray
    q_r32: jnp.ndarray
    q_r32_sh: jnp.ndarray
    q_wr: jnp.ndarray            # fwd stacks (K6f)
    q_wc: jnp.ndarray
    q_tw: jnp.ndarray
    q_tw_sh: jnp.ndarray
    q_wri: jnp.ndarray           # inv stacks (K1t)
    q_wci: jnp.ndarray
    q_twi: jnp.ndarray
    q_twi_sh: jnp.ndarray
    bhatinv: jnp.ndarray         # [kql]
    bhatinv_sh: jnp.ndarray
    pinv: jnp.ndarray            # [kql]
    pinv_sh: jnp.ndarray
    # ---- QlP-layout: row axis length kqlp, sharded in kqlp/L blocks ----
    l_kq: jnp.ndarray
    l_km32: jnp.ndarray
    l_kc: jnp.ndarray
    l_kratio: jnp.ndarray
    l_wr: jnp.ndarray
    l_wc: jnp.ndarray
    l_tw: jnp.ndarray
    l_tw_sh: jnp.ndarray
    own_mask: jnp.ndarray        # [kqlp, nd] int32: row is digit j's own
    keys_b: jnp.ndarray          # [nd, kqlp, N] level-layout eval key
    keys_a: jnp.ndarray
    keys_b_sh: jnp.ndarray
    keys_a_sh: jnp.ndarray
    # K2: tau-major block-diagonal conv stack, rows (tau, j)
    conv_w: jnp.ndarray          # [3, 2, kqlp*nd, nd*alpha] int8
    conv_rm_q: jnp.ndarray       # [kqlp*nd, 1]
    conv_rm_m32: jnp.ndarray
    conv_rm_c: jnp.ndarray       # [9, kqlp*nd, 1]
    conv_rm_ratio: jnp.ndarray
    # K5: row-sharded P->Q conv stack
    pconv_w: jnp.ndarray         # [3, 2, kql, kp] int8
    pconv_rm_q: jnp.ndarray      # [kql, 1]
    pconv_rm_m32: jnp.ndarray
    pconv_rm_c: jnp.ndarray
    pconv_rm_ratio: jnp.ndarray
    # ---- P tables (replicated; kp rarely divides the mesh) ----
    p_kq: jnp.ndarray
    p_km32: jnp.ndarray
    p_kc: jnp.ndarray
    p_kratio: jnp.ndarray
    p_wri: jnp.ndarray
    p_wci: jnp.ndarray
    p_twi: jnp.ndarray
    p_twi_sh: jnp.ndarray
    pscale: jnp.ndarray          # [kp]
    pscale_sh: jnp.ndarray
    # statics
    kql: int = struct.field(pytree_node=False, default=0)
    kp: int = struct.field(pytree_node=False, default=0)
    nd: int = struct.field(pytree_node=False, default=0)
    alpha: int = struct.field(pytree_node=False, default=0)
    r: int = struct.field(pytree_node=False, default=0)
    c: int = struct.field(pytree_node=False, default=0)


def _w_stack_pair(w: np.ndarray) -> np.ndarray:
    """[D, A] uint -> [3, 2, D, A] int8 (digit-pair rows kept as a
    separate axis so the row axis D shards cleanly)."""
    l = kara.balanced_limbs128_host(w)
    s02 = (l[0].astype(np.int16) + l[2]).astype(np.int8)
    s13 = (l[1].astype(np.int16) + l[3]).astype(np.int8)
    return np.stack([np.stack([l[0], l[1]]),
                     np.stack([l[2], l[3]]),
                     np.stack([s02, s13])], axis=0)


def make_sharded_fused_tables(cc, size_ql: int,
                              pad_to: int | None = None
                              ) -> ShardedFusedTables:
    """Host precompute from a CryptoContext (mirrors
    ks_fused.make_fused_ks_tables with shard-friendly layouts).

    pad_to (>= size_ql): row axes get `pad_to` Q rows with ZERO weights
    beyond the level's real towers — the sharded analog of ks_fused's
    shape buckets, so a depth chain whose tower count stops dividing the
    limb axis keeps a uniform sharded layout (round-4 verdict task 8:
    "handle one non-divisible level")."""
    mq = [int(x) for x in cc.moduli_q[:size_ql]]
    kb = pad_to or len(mq)
    mq_pad = [int(x) for x in cc.moduli_q[:kb]]
    mp = [int(x) for x in cc.moduli_p]
    mqlp = mq_pad + mp
    kql, kp = len(mq), len(mp)
    k_full = len(cc.moduli_q)
    num_parts = cc.params.num_large_digits
    alpha = -(-k_full // num_parts)
    nd = min(-(-kql // alpha), num_parts)
    nd_b = num_parts if kb > kql else nd
    n = cc.ring_dim

    t, kc = ks_fused._qlp_ntt_tables(tuple(mqlp), n)
    r, c = t["r"], t["c"]

    # K1 epilogue + K6 epilogue constants (as in make_fused_ks_tables);
    # zero on pad rows
    bhatinv = [0] * kb
    for i, q in enumerate(mq):
        j = min(i // alpha, nd - 1)
        digits = mq[j * alpha:min((j + 1) * alpha, kql)]
        bj = 1
        for b in digits:
            bj *= b
        bhatinv[i] = pow((bj // q) % q, -1, q)
    bh, bh_sh = ks_fused._shoup_np(bhatinv, mq_pad)
    big_p = 1
    for p_ in mp:
        big_p *= p_
    pinv, pinv_sh = ks_fused._shoup_np(
        [pow(big_p % q, -1, q) for q in mq] + [0] * (kb - kql), mq_pad)
    pscale = [pow((big_p // p_) % p_, -1, p_) for p_ in mp]
    ps, ps_sh = ks_fused._shoup_np(pscale, mp)
    r32, r32_sh = ks_fused._shoup_np([(1 << 32) % q for q in mq_pad],
                                     mq_pad)

    # K2 conv stack, TAU-MAJOR rows (tau, j) so the row axis shards by tau
    wbd = np.zeros(((kb + kp) * nd_b, nd_b * alpha), np.uint64)
    for j in range(nd):
        start, end = j * alpha, min((j + 1) * alpha, kql)
        digits = mq[start:end]
        bj = 1
        for b in digits:
            bj *= b
        for tau, qt in enumerate(mqlp):
            if start <= tau < end or (kql <= tau < kb):
                continue
            for i, b in enumerate(digits):
                wbd[tau * nd_b + j, j * alpha + i] = (bj // b) % qt
    conv_w = _w_stack_pair(wbd)
    rm = kara.make_kara_rowmod_consts(
        [q for q in mqlp for _ in range(nd_b)])

    # K5 stack (row axis = kb, shards directly; zero pad rows)
    w5 = np.zeros((kb, kp), np.uint64)
    for i, q in enumerate(mq):
        for jj, p_ in enumerate(mp):
            w5[i, jj] = (big_p // p_) % q
    pconv_w = _w_stack_pair(w5)
    rm5 = kara.make_kara_rowmod_consts(mq_pad)

    own = np.zeros((kb + kp, nd_b), np.int32)
    for j in range(nd):
        own[j * alpha:min((j + 1) * alpha, kql), j] = 1

    kcq = kara.make_kara_consts(mq_pad)
    kcp = kara.make_kara_consts(mp)
    nd = nd_b
    kql = kb

    ek = next(iter(cc.eval_mult_keys.values()))
    lvl = lambda a: jnp.concatenate([a[:, :kql], a[:, k_full:]], axis=1)

    j_ = jnp.asarray
    return ShardedFusedTables(
        q_kq=kcq["q"], q_km32=kcq["m32"], q_kc=kcq["c"],
        q_kratio=kcq["ratio"], q_r32=j_(r32), q_r32_sh=j_(r32_sh),
        q_wr=j_(t["wr"][:kql]), q_wc=j_(t["wc"][:kql]),
        q_tw=j_(t["tw"][:kql]), q_tw_sh=j_(t["tw_sh"][:kql]),
        q_wri=j_(t["wri"][:kql]), q_wci=j_(t["wci"][:kql]),
        q_twi=j_(t["twi"][:kql]), q_twi_sh=j_(t["twi_sh"][:kql]),
        bhatinv=j_(bh), bhatinv_sh=j_(bh_sh),
        pinv=j_(pinv), pinv_sh=j_(pinv_sh),
        l_kq=kc["q"], l_km32=kc["m32"], l_kc=kc["c"], l_kratio=kc["ratio"],
        l_wr=j_(t["wr"]), l_wc=j_(t["wc"]),
        l_tw=j_(t["tw"]), l_tw_sh=j_(t["tw_sh"]),
        own_mask=j_(own),
        keys_b=lvl(ek.bv), keys_a=lvl(ek.av),
        keys_b_sh=lvl(ek.bv_sh), keys_a_sh=lvl(ek.av_sh),
        conv_w=j_(conv_w), conv_rm_q=rm["q"], conv_rm_m32=rm["m32"],
        conv_rm_c=rm["c"], conv_rm_ratio=rm["ratio"],
        pconv_w=j_(pconv_w), pconv_rm_q=rm5["q"], pconv_rm_m32=rm5["m32"],
        pconv_rm_c=rm5["c"], pconv_rm_ratio=rm5["ratio"],
        p_kq=kcp["q"], p_km32=kcp["m32"], p_kc=kcp["c"],
        p_kratio=kcp["ratio"],
        p_wri=j_(t["wri"][kql:]), p_wci=j_(t["wci"][kql:]),
        p_twi=j_(t["twi"][kql:]), p_twi_sh=j_(t["twi_sh"][kql:]),
        pscale=j_(ps), pscale_sh=j_(ps_sh),
        kql=kql, kp=kp, nd=nd, alpha=alpha, r=r, c=c)


def table_specs(st: ShardedFusedTables,
                limb: str = "limb") -> ShardedFusedTables:
    """PartitionSpec pytree matching ShardedFusedTables (statics copied
    from the real tables: pytree metadata must agree)."""
    L = lambda *tail: P(limb, *tail)
    N0 = P()
    return ShardedFusedTables(
        q_kq=L(), q_km32=L(), q_kc=L(None), q_kratio=L(None),
        q_r32=L(), q_r32_sh=L(),
        q_wr=L(None, None, None), q_wc=L(None, None, None),
        q_tw=L(None, None), q_tw_sh=L(None, None),
        q_wri=L(None, None, None), q_wci=L(None, None, None),
        q_twi=L(None, None), q_twi_sh=L(None, None),
        bhatinv=L(), bhatinv_sh=L(), pinv=L(), pinv_sh=L(),
        l_kq=L(), l_km32=L(), l_kc=L(None), l_kratio=L(None),
        l_wr=L(None, None, None), l_wc=L(None, None, None),
        l_tw=L(None, None), l_tw_sh=L(None, None),
        own_mask=L(None),
        keys_b=P(None, limb, None), keys_a=P(None, limb, None),
        keys_b_sh=P(None, limb, None), keys_a_sh=P(None, limb, None),
        conv_w=P(None, None, limb, None),
        conv_rm_q=L(None), conv_rm_m32=L(None),
        conv_rm_c=P(None, limb, None), conv_rm_ratio=P(None, limb, None),
        pconv_w=P(None, None, limb, None),
        pconv_rm_q=L(None), pconv_rm_m32=L(None),
        pconv_rm_c=P(None, limb, None), pconv_rm_ratio=P(None, limb, None),
        p_kq=N0, p_km32=N0, p_kc=N0, p_kratio=N0,
        p_wri=N0, p_wci=N0, p_twi=N0, p_twi_sh=N0,
        pscale=N0, pscale_sh=N0,
        kql=st.kql, kp=st.kp, nd=st.nd, alpha=st.alpha, r=st.r, c=st.c)


def require_divisible(st: ShardedFusedTables, limb: int):
    if st.kql % limb or (st.kql + st.kp) % limb:
        raise ValueError(
            f"limb axis {limb} must divide kql={st.kql} and "
            f"kqlp={st.kql + st.kp}; size the modulus chain to the mesh")


# ---------------------------------------------------------------------------
# kernel variants (pair-layout weight stacks, mask-driven own rows)
# ---------------------------------------------------------------------------

def _kara_nn_pair(w4, x):
    """Like nf._kara_nn but with w as [3, 2, D, A] (pair axis separate).

    Returns the 9 epilogue sources [D, B]."""
    b = x.shape[-1]
    g0c, g2c, g1c = kara.kara_x_groups(x)                  # [A, 2B]
    hilo = []
    for g_idx, g in ((0, g0c), (1, g2c), (2, g1c)):
        hi = jax.lax.dot_general(w4[g_idx, 0], g, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        lo = jax.lax.dot_general(w4[g_idx, 1], g, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        hilo.append((hi, lo))

    def tri(hi, lo):
        return (hi[:, :b], hi[:, b:] + lo[:, :b], lo[:, b:])
    p0 = tri(*hilo[0])
    p2 = tri(*hilo[1])
    p1 = tri(*hilo[2])
    return [p0[0], p0[1], p0[2], p1[0], p1[1], p1[2], p2[0], p2[1], p2[2]]


def _conv_rows_kernel(w_ref, rq_ref, rm32_ref, rc_ref, rratio_ref,
                      x_ref, o_ref):
    ps = _kara_nn_pair(w_ref[...], x_ref[...])
    cv = [rc_ref[i] for i in range(kara.NSRC)]
    rv = [rratio_ref[i] for i in range(kara.NSRC)]
    o_ref[...] = kara.kara_recombine(ps, rq_ref[...], cv, rv, rm32_ref[...])


def _conv_digits_rows(y2, st: ShardedFusedTables, rows_loc: int,
                      tile_b: int = 4096):
    """K2 on local rows: y2 [nd*alpha, N] -> [rows_loc, N], rows (tau, j)
    tau-major with tau local."""
    nb = y2.shape[-1]
    tb = min(tile_b, nb)
    return pl.pallas_call(
        _conv_rows_kernel,
        grid=(nb // tb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5 + [
            pl.BlockSpec((y2.shape[0], tb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_loc, tb), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_loc, nb), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=ks_fused.INTERPRET,
    )(st.conv_w, st.conv_rm_q, st.conv_rm_m32, st.conv_rm_c,
      st.conv_rm_ratio, y2)


def _conv_p_to_q_rows(p_coeff, st: ShardedFusedTables, kql_loc: int,
                      tile_b: int = 4096):
    """K5 on local Q rows: p_coeff [2, kp, N] -> [2, kql_loc, N]."""
    ne, kp, nb = p_coeff.shape
    tb = min(tile_b, nb)

    def kern(w_ref, rq_ref, rm32_ref, rc_ref, rratio_ref, x_ref, o_ref):
        ps = _kara_nn_pair(w_ref[...], x_ref[0])
        cv = [rc_ref[i] for i in range(kara.NSRC)]
        rv = [rratio_ref[i] for i in range(kara.NSRC)]
        o_ref[0] = kara.kara_recombine(ps, rq_ref[...], cv, rv,
                                       rm32_ref[...])

    return pl.pallas_call(
        kern,
        grid=(ne, nb // tb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5 + [
            pl.BlockSpec((1, kp, tb), lambda e, b: (e, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kql_loc, tb), lambda e, b: (e, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ne, kql_loc, nb), jnp.uint32),
        interpret=ks_fused.INTERPRET,
    )(st.pconv_w, st.pconv_rm_q, st.pconv_rm_m32, st.pconv_rm_c,
      st.pconv_rm_ratio, p_coeff)


def _ntt_keymul_acc_sharded(conv4, c2_rows, st: ShardedFusedTables,
                            kqlp_loc: int):
    """K3 on local QlP rows. conv4 [kqlp_loc, nd, R, C] COEFF (tau-major);
    c2_rows [kqlp_loc, R, C] EVAL (pre-gathered rows of c2, clamped);
    own rows selected by the SMEM mask. Returns [2, kqlp_loc, R, C]."""
    nd = st.nd
    r, c = st.r, st.c
    k4 = lambda a: a.reshape(nd, kqlp_loc, r, c)

    def kern(q_ref, m32_ref, c_ref, ratio_ref, mask_ref,
             wr_ref, wc_ref, tw_ref, twsh_ref,
             conv_ref, c2_ref, bv_ref, bvsh_ref, av_ref, avsh_ref,
             o0_ref):
        tau = pl.program_id(0)
        q = q_ref[tau]
        acc0 = acc1 = None
        for j in range(nd):
            own = mask_ref[tau, j] != 0
            s = jax.lax.cond(
                own,
                lambda: c2_ref[0],
                lambda j=j: ks_fused._fwd_core(
                    conv_ref[0, j], tau, wr_ref[0], wc_ref[0],
                    tw_ref[0], twsh_ref[0],
                    q_ref, m32_ref, c_ref, ratio_ref, lazy_out=True))
            t0 = mo.mul_mod_shoup_fast(s, bv_ref[j, 0], bvsh_ref[j, 0], q)
            t1 = mo.mul_mod_shoup_fast(s, av_ref[j, 0], avsh_ref[j, 0], q)
            acc0 = t0 if acc0 is None else mo.add_mod(acc0, t0, q)
            acc1 = t1 if acc1 is None else mo.add_mod(acc1, t1, q)
        o0_ref[0, 0] = acc0
        o0_ref[1, 0] = acc1

    ws = ks_fused._w_spec
    return pl.pallas_call(
        kern,
        grid=(kqlp_loc,),
        in_specs=ks_fused._smem_specs(5) + [
            ws((kara.KARA_GROUPS, 2 * r, r), lambda tau: (tau, 0, 0, 0)),
            ws((kara.KARA_GROUPS, 2 * c, c), lambda tau: (tau, 0, 0, 0)),
            ws((r, c), lambda tau: (tau, 0, 0)),
            ws((r, c), lambda tau: (tau, 0, 0)),
            pl.BlockSpec((1, nd, r, c), lambda tau: (tau, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            ws((r, c), lambda tau: (tau, 0, 0)),
            pl.BlockSpec((nd, 1, r, c), lambda tau: (0, tau, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, 1, r, c), lambda tau: (0, tau, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, 1, r, c), lambda tau: (0, tau, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, 1, r, c), lambda tau: (0, tau, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, r, c), lambda tau: (0, tau, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, kqlp_loc, r, c), jnp.uint32),
        interpret=ks_fused.INTERPRET,
    )(st.l_kq, st.l_km32, st.l_kc, st.l_kratio, st.own_mask,
      st.l_wr, st.l_wc, st.l_tw, st.l_tw_sh,
      conv4, c2_rows, k4(st.keys_b), k4(st.keys_b_sh),
      k4(st.keys_a), k4(st.keys_a_sh))


def _local_tabs_q_inv(st: ShardedFusedTables, kql_loc: int):
    """A FusedKSTables view over the LOCAL Q rows for _tensor_intt."""
    return ks_fused.FusedKSTables(
        wr=None, wc=None, wri=st.q_wri, wci=st.q_wci,
        tw=None, tw_sh=None, twi=st.q_twi, twi_sh=st.q_twi_sh,
        kq=st.q_kq, km32=st.q_km32, kc=st.q_kc, kratio=st.q_kratio,
        r32_q=st.q_r32, r32_q_sh=st.q_r32_sh,
        bhatinv_q=st.bhatinv, bhatinv_q_sh=st.bhatinv_sh,
        pscale=None, pscale_sh=None, t_modq=None, t_modq_sh=None,
        pinv_q=st.pinv, pinv_q_sh=st.pinv_sh,
        conv_w=None, conv_rm_q=None, conv_rm_m32=None, conv_rm_c=None,
        conv_rm_ratio=None, pconv_w=None, pconv_rm_q=None,
        pconv_rm_m32=None, pconv_rm_c=None, pconv_rm_ratio=None,
        kql_real=None, kql=kql_loc, kp=0, nd=st.nd, alpha=st.alpha,
        k_q_full=0, r=st.r, c=st.c, t_is_one=True)


def _local_tabs_q_fwd(st: ShardedFusedTables, kql_loc: int):
    """FusedKSTables view for _ntt_submul_final on the local Q rows."""
    return dataclasses.replace(
        _local_tabs_q_inv(st, kql_loc),
        wr=st.q_wr, wc=st.q_wc, tw=st.q_tw, tw_sh=st.q_tw_sh)


def _local_tabs_p(st: ShardedFusedTables):
    """FusedKSTables view over the (replicated) P rows for K4."""
    return ks_fused.FusedKSTables(
        wr=None, wc=None, wri=st.p_wri, wci=st.p_wci,
        tw=None, tw_sh=None, twi=st.p_twi, twi_sh=st.p_twi_sh,
        kq=st.p_kq, km32=st.p_km32, kc=st.p_kc, kratio=st.p_kratio,
        r32_q=None, r32_q_sh=None, bhatinv_q=None, bhatinv_q_sh=None,
        pscale=st.pscale, pscale_sh=st.pscale_sh,
        t_modq=None, t_modq_sh=None, pinv_q=None, pinv_q_sh=None,
        conv_w=None, conv_rm_q=None, conv_rm_m32=None, conv_rm_c=None,
        conv_rm_ratio=None, pconv_w=None, pconv_rm_q=None,
        pconv_rm_m32=None, pconv_rm_c=None, pconv_rm_ratio=None,
        kql_real=None, kql=st.kp, kp=0, nd=st.nd, alpha=st.alpha,
        k_q_full=0, r=st.r, c=st.c, t_is_one=True)


def mult_relin_fused_local(a0, a1, b0, b1, st: ShardedFusedTables,
                           limb_axis: str = "limb"):
    """shard_map-local body: inputs [kql_loc, N] EVAL; tables local rows."""
    kql, kp, nd, alpha = st.kql, st.kp, st.nd, st.alpha
    r, c = st.r, st.c
    n = r * c
    kql_loc = a0.shape[0]
    kqlp_loc = st.keys_b.shape[1]

    a0_4, a1_4 = a0.reshape(kql_loc, r, c), a1.reshape(kql_loc, r, c)
    b0_4, b1_4 = b0.reshape(kql_loc, r, c), b1.reshape(kql_loc, r, c)

    # K1t on local Q rows (slim 2-in/2-out form; the tensor terms are
    # recomputed in K6f's epilogue, see ks_fused._ntt_submul_final)
    c2x, y_loc = ks_fused._tensor_intt(
        a1_4, b1_4, _local_tabs_q_inv(st, kql_loc))

    # mixing point 1: every digit's coefficients everywhere
    y = jax.lax.all_gather(y_loc.reshape(kql_loc, n), limb_axis,
                           tiled=True)                      # [kql, N]
    c2_all = jax.lax.all_gather(c2x.reshape(kql_loc, n), limb_axis,
                                tiled=True)                 # [kql, N]
    pad = nd * alpha - kql
    if pad:
        y = jnp.concatenate([y, jnp.zeros((pad, n), jnp.uint32)], axis=0)

    # K2 on local QlP rows (tau-major (tau, j) rows)
    conv = _conv_digits_rows(y, st, kqlp_loc * nd)
    conv4 = conv.reshape(kqlp_loc, nd, r, c)

    # rows of c2 this device's QlP rows may pass through (own towers)
    idx = jax.lax.axis_index(limb_axis)
    rows = idx * kqlp_loc + jnp.arange(kqlp_loc)
    c2_rows = jnp.take(c2_all, jnp.minimum(rows, kql - 1),
                       axis=0).reshape(kqlp_loc, r, c)

    # K3 on local QlP rows
    ext = _ntt_keymul_acc_sharded(conv4, c2_rows, st, kqlp_loc)

    # mixing point 2: ApproxModDown needs the P-part everywhere
    ext_all = jax.lax.all_gather(ext.reshape(2, kqlp_loc, n), limb_axis,
                                 axis=1, tiled=True)        # [2, kqlp, N]
    p_part = ext_all[:, kql:, :].reshape(2, kp, r, c)

    # K4 (replicated: kp is small) + K5 on local Q rows
    pc = ks_fused._intt_scale(p_part, _local_tabs_p(st), 0,
                              st.pscale, st.pscale_sh)
    convq = _conv_p_to_q_rows(pc.reshape(2, kp, n), st, kql_loc)

    # K6f on local Q rows
    xq = jax.lax.dynamic_slice_in_dim(ext_all, idx * kql_loc, kql_loc,
                                      axis=1).reshape(2, kql_loc, r, c)
    out = ks_fused._ntt_submul_final(
        convq.reshape(2, kql_loc, r, c), xq, a0_4, a1_4, b0_4, b1_4,
        _local_tabs_q_fwd(st, kql_loc))
    return out[0].reshape(kql_loc, n), out[1].reshape(kql_loc, n)
