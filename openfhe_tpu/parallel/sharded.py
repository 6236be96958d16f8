"""Limb-axis-sharded mult+relinearize via shard_map + explicit collectives.

The multi-chip execution model for the hybrid keyswitch (SURVEY.md §2.5 /
§7.11): RNS towers shard over the mesh's "limb" axis (the TPU replacement
for the reference's 53 OpenMP-over-towers loops, dcrtpoly-impl.h:239ff and
keyswitch-hybrid.cpp:96); ciphertext batches shard over "dp".

Communication pattern (row-parallel base conversion):
  * every per-tower op (tensor product, NTT/INTT, key inner product,
    final scaling) is LOCAL to the device owning the tower;
  * the two RNS base-conversion mixing points each need the source
    residues everywhere, so they are `jax.lax.all_gather`s over "limb":
      1. digit coefficients y (after INTT + (B_j/b_i)^{-1}) — gathered,
         then each device computes ONLY ITS tower rows of every digit's
         extension (conversion weights are sharded by output row, own
         rows zeroed as in pke/keyswitch/ks_fused.py);
      2. the P-part coefficients in ApproxModDown.
    No psum is needed: outputs are row-partitioned, inputs gathered.

Requirements: kql and kqlp divisible by the limb-axis size (choose the
chain length to fit the mesh, as production deployments do). Uses the
portable XLA building blocks (ops/ntt VPU path, lattice/rns_tools), so it
runs identically on real TPU meshes and on the virtual CPU mesh the
driver uses for validation (__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openfhe_tpu.lattice.basis import Basis
from openfhe_tpu.lattice import rns_tools as rt
from openfhe_tpu.math import modops as mo
from openfhe_tpu.ops.ntt import _ntt_fwd_vpu, _ntt_inv_vpu


@struct.dataclass
class ShardedMultTables:
    """Tables for one level, laid out for tower-axis sharding."""
    basis_qlp: Basis          # [kqlp] towers (Q then P) — sharded
    basis_ql: Basis           # [kql] — sharded
    basis_p: Basis            # [kp] — sharded (kp may be < limb: replicated)
    bhatinv: jnp.ndarray      # [kql, 1] digit-local lift inverse — sharded
    bhatinv_sh: jnp.ndarray
    conv_w: jnp.ndarray       # [nd, kqlp, alpha, 1] (B_j/b_i mod q_tau),
    conv_w_sh: jnp.ndarray    #   own rows zero — sharded on axis 1
    keys_b: jnp.ndarray       # [nd, kqlp, N] — sharded on axis 1
    keys_a: jnp.ndarray
    pscale: jnp.ndarray       # [kp, 1] (P/p_i)^{-1} mod p_i — P-part INTT
    pscale_sh: jnp.ndarray
    pconv_w: jnp.ndarray      # [kql, kp, 1] (P/p_j mod q_i) — sharded ax 0
    pconv_w_sh: jnp.ndarray
    pinv: jnp.ndarray         # [kql, 1] P^{-1} mod q — sharded
    pinv_sh: jnp.ndarray
    kql: int = struct.field(pytree_node=False)
    kp: int = struct.field(pytree_node=False)
    nd: int = struct.field(pytree_node=False)
    alpha: int = struct.field(pytree_node=False)


def _shoup_cols(vals_2d, mods_col):
    v = np.asarray(vals_2d, np.uint64)
    q = np.asarray(mods_col, np.uint64)
    return (v.astype(np.uint32), ((v << np.uint64(32)) // q).astype(np.uint32))


def make_sharded_tables(cc, size_ql: int) -> ShardedMultTables:
    """Host precompute from a CryptoContext (mirrors
    ks_fused.make_fused_ks_tables, but with plain uint32 Shoup weights so
    the math runs on any backend)."""
    mq = [int(x) for x in cc.moduli_q[:size_ql]]
    mp = [int(x) for x in cc.moduli_p]
    mqlp = mq + mp
    kql, kp = len(mq), len(mp)
    k_full = len(cc.moduli_q)
    num_parts = cc.params.num_large_digits
    alpha = -(-k_full // num_parts)
    nd = min(-(-kql // alpha), num_parts)

    bhatinv = np.zeros((kql, 1), np.uint64)
    conv_w = np.zeros((nd, kql + kp, alpha, 1), np.uint64)
    for j in range(nd):
        start, end = j * alpha, min((j + 1) * alpha, kql)
        digits = mq[start:end]
        bj = 1
        for b in digits:
            bj *= b
        for i, b in enumerate(digits):
            bhatinv[start + i, 0] = pow((bj // b) % b, -1, b)
        for tau, qt in enumerate(mqlp):
            if start <= tau < end:
                continue
            for i, b in enumerate(digits):
                conv_w[j, tau, i, 0] = (bj // b) % qt
    bh, bh_sh = _shoup_cols(bhatinv, np.array(mq, np.uint64).reshape(-1, 1))
    cw, cw_sh = _shoup_cols(
        conv_w, np.array(mqlp, np.uint64).reshape(1, -1, 1, 1))

    big_p = 1
    for p in mp:
        big_p *= p
    pscale = np.array([[pow((big_p // p) % p, -1, p)] for p in mp], np.uint64)
    psc, psc_sh = _shoup_cols(pscale, np.array(mp, np.uint64).reshape(-1, 1))
    pconv = np.zeros((kql, kp, 1), np.uint64)
    for i, q in enumerate(mq):
        for jj, p in enumerate(mp):
            pconv[i, jj, 0] = (big_p // p) % q
    pc, pc_sh = _shoup_cols(pconv, np.array(mq, np.uint64).reshape(-1, 1, 1))
    pinv = np.array([[pow(big_p % q, -1, q)] for q in mq], np.uint64)
    pv, pv_sh = _shoup_cols(pinv, np.array(mq, np.uint64).reshape(-1, 1))

    ek = next(iter(cc.eval_mult_keys.values()))
    keys_b = jnp.concatenate([ek.bv[:, :kql], ek.bv[:, k_full:]], axis=1)
    keys_a = jnp.concatenate([ek.av[:, :kql], ek.av[:, k_full:]], axis=1)

    j = jnp.asarray
    return ShardedMultTables(
        basis_qlp=cc.basis_q.slice(0, kql).concat(cc.basis_p),
        basis_ql=cc.basis_q.slice(0, kql), basis_p=cc.basis_p,
        bhatinv=j(bh), bhatinv_sh=j(bh_sh),
        conv_w=j(cw), conv_w_sh=j(cw_sh),
        keys_b=keys_b, keys_a=keys_a,
        pscale=j(psc), pscale_sh=j(psc_sh),
        pconv_w=j(pc), pconv_w_sh=j(pc_sh),
        pinv=j(pv), pinv_sh=j(pv_sh),
        kql=kql, kp=kp, nd=nd, alpha=alpha)


def table_specs(tabs: ShardedMultTables, limb="limb") -> ShardedMultTables:
    """in_specs pytree matching ShardedMultTables (same treedef: built by
    mapping specs onto the real tables' leaves)."""
    def basis_spec(b, axis):
        return jax.tree_util.tree_map(lambda _: P(axis, None), b)

    return ShardedMultTables(
        basis_qlp=basis_spec(tabs.basis_qlp, limb),
        basis_ql=basis_spec(tabs.basis_ql, limb),
        basis_p=basis_spec(tabs.basis_p, None),   # kp rarely divides; repl.
        bhatinv=P(limb, None), bhatinv_sh=P(limb, None),
        conv_w=P(None, limb, None, None), conv_w_sh=P(None, limb, None, None),
        keys_b=P(None, limb, None), keys_a=P(None, limb, None),
        pscale=P(None, None), pscale_sh=P(None, None),
        pconv_w=P(limb, None, None), pconv_w_sh=P(limb, None, None),
        pinv=P(limb, None), pinv_sh=P(limb, None),
        kql=tabs.kql, kp=tabs.kp, nd=tabs.nd, alpha=tabs.alpha)


@struct.dataclass
class ShardedDropTables:
    """CKKS rescale (DropLastElementAndScale) laid out for limb sharding.

    Row layout keeps the FULL [kql] tower axis — the dropped tower's row
    has qlinv = 0, so the output keeps a uniform sharded shape with that
    row zeroed; callers track the logical size (the same bucketing
    contract as ks_fused's kql_real)."""
    basis_ql: Basis           # [kql] — sharded
    basis_last: Basis         # [1] the dropped tower — replicated
    qlinv: jnp.ndarray        # [kql, 1]; 0 on the dropped row — sharded
    qlinv_sh: jnp.ndarray
    ql_half_modqi: jnp.ndarray  # [kql, 1] — sharded
    ql_half_modqi_sh: jnp.ndarray
    ql_half: int = struct.field(pytree_node=False)
    kql: int = struct.field(pytree_node=False)


def make_sharded_drop_tables(cc, size_ql: int,
                             pad_to: int | None = None) -> ShardedDropTables:
    """Drop tower size_ql-1; rows padded to `pad_to` (zeros)."""
    kb = pad_to or size_ql
    moduli = [int(x) for x in cc.moduli_q[:size_ql]]
    ql = moduli[-1]
    rest = moduli[:-1]
    half = ql >> 1
    qlinv = np.zeros((kb, 1), np.uint64)
    hmod = np.zeros((kb, 1), np.uint64)
    mods = np.ones((kb, 1), np.uint64)
    for i, q in enumerate(rest):
        qlinv[i, 0] = pow(ql % q, -1, q)
        hmod[i, 0] = half % q
        mods[i, 0] = q
    qi, qi_sh = _shoup_cols(qlinv, mods)
    hm, hm_sh = _shoup_cols(hmod, mods)
    return ShardedDropTables(
        basis_ql=cc.basis_q.slice(0, kb),
        basis_last=cc.basis_q.slice(size_ql - 1, size_ql),
        qlinv=jnp.asarray(qi), qlinv_sh=jnp.asarray(qi_sh),
        ql_half_modqi=jnp.asarray(hm), ql_half_modqi_sh=jnp.asarray(hm_sh),
        ql_half=half, kql=kb)


def drop_table_specs(dt: ShardedDropTables,
                     limb: str = "limb") -> ShardedDropTables:
    def basis_spec(b, axis):
        return jax.tree_util.tree_map(lambda _: P(axis, None), b)

    return ShardedDropTables(
        basis_ql=basis_spec(dt.basis_ql, limb),
        basis_last=basis_spec(dt.basis_last, None),
        qlinv=P(limb, None), qlinv_sh=P(limb, None),
        ql_half_modqi=P(limb, None), ql_half_modqi_sh=P(limb, None),
        ql_half=dt.ql_half, kql=dt.kql)


def drop_last_and_scale_local(x, dt: ShardedDropTables, drop_row: int,
                              limb_axis: str = "limb"):
    """shard_map-local CKKS rescale: x [kql_loc, N] EVAL sharded over
    `limb_axis`; returns the same sharded shape with global row
    `drop_row` zeroed (the in-region analog of rt.drop_last_and_scale —
    round-4 verdict task 8: a depth chain must not leave the sharded
    region to rescale).

    The dropped tower's coefficient vector is broadcast with one psum
    over the limb axis; everything else is tower-local."""
    n_dev = jax.lax.psum(1, limb_axis)
    idx = jax.lax.axis_index(limb_axis)
    kql_loc = x.shape[0]
    owner = drop_row // kql_loc
    row = drop_row % kql_loc
    # INTT of the (locally held) dropped row on every device, masked to
    # the owner; basis_last is the true dropped tower's basis
    u_own = _ntt_inv_vpu(x[row:row + 1, :], dt.basis_last)
    u = jax.lax.psum(jnp.where(idx == owner, u_own, jnp.uint32(0)),
                     limb_axis)                               # [1, N]
    u_shift = mo.add_mod(u, jnp.uint32(dt.ql_half), dt.basis_last.q)
    w = mo.barrett_u32(u_shift, dt.basis_ql.q, dt.basis_ql.m32)
    w = mo.sub_mod(w, dt.ql_half_modqi, dt.basis_ql.q)
    w = _ntt_fwd_vpu(w, dt.basis_ql)
    diff = mo.sub_mod(x, w, dt.basis_ql.q)
    return mo.mul_mod_shoup(diff, dt.qlinv, dt.qlinv_sh, dt.basis_ql.q)


def _conv_rows(y_full, w, w_sh, q_col):
    """out[r] = sum_i y_full[i] * w[r, i] mod q_r (local rows).

    y_full [A, N]; w/w_sh [rows, A, 1]; q_col [rows, 1]."""
    def body(acc, xs):
        yi, wi, wi_sh = xs
        return mo.add_mod(acc, mo.mul_mod_shoup(yi[None, :], wi, wi_sh,
                                                q_col), q_col), None
    acc0 = jnp.zeros((w.shape[0], y_full.shape[-1]), jnp.uint32)
    acc, _ = jax.lax.scan(
        body, acc0, (y_full, jnp.moveaxis(w, 1, 0), jnp.moveaxis(w_sh, 1, 0)))
    return acc


def mult_relin_local(a0, a1, b0, b1, tabs: ShardedMultTables,
                     limb_axis: str = "limb"):
    """The shard_map-local body: inputs [kql_local, N] EVAL, tables local.

    Runs inside shard_map over the limb axis; all_gathers mark the two
    base-conversion mixing points."""
    bql, bqlp = tabs.basis_ql, tabs.basis_qlp
    kql, kp, nd, alpha = tabs.kql, tabs.kp, tabs.nd, tabs.alpha

    mm = lambda x, y: mo.mul_mod(x, y, bql.q, bql.r32, bql.r32_sh, bql.m32)
    c0 = mm(a0, b0)
    c2 = mm(a1, b1)
    cross = mm(mo.add_mod(a0, a1, bql.q), mo.add_mod(b0, b1, bql.q))
    c1 = mo.sub_mod(mo.sub_mod(cross, c0, bql.q), c2, bql.q)

    # ---- decompose: local INTT + digit-local scale, then GATHER --------
    # (mixing point 1: the base conversion needs every digit's residues;
    # c2's EVAL form is gathered too because "own" towers of each digit
    # pass through unconverted, and the ql / qlp row partitions differ)
    y_loc = mo.mul_mod_shoup(_ntt_inv_vpu(c2, bql), tabs.bhatinv,
                             tabs.bhatinv_sh, bql.q)
    y = jax.lax.all_gather(y_loc, limb_axis, tiled=True)       # [kql, N]
    c2_all = jax.lax.all_gather(c2, limb_axis, tiled=True)     # [kql, N]
    if nd * alpha > kql:                       # short last digit: zero-pad
        y = jnp.concatenate(
            [y, jnp.zeros((nd * alpha - kql, y.shape[-1]), jnp.uint32)], 0)

    # ---- per-digit extension to local QlP rows + key inner product ----
    idx = jax.lax.axis_index(limb_axis)
    k_loc = tabs.keys_b.shape[1]                # local qlp rows per device
    rows = idx * k_loc + jnp.arange(k_loc)      # global qlp row ids
    c2_rows = jnp.take(c2_all, jnp.minimum(rows, kql - 1), axis=0)
    ext0 = ext1 = None
    for j in range(nd):
        start, end = j * alpha, min((j + 1) * alpha, kql)
        y_dig = jax.lax.dynamic_slice_in_dim(y, start, alpha, axis=0)
        conv = _conv_rows(y_dig, tabs.conv_w[j], tabs.conv_w_sh[j],
                          bqlp.q)                              # [loc, N]
        d_loc = _ntt_fwd_vpu(conv, bqlp)
        own = (rows >= start) & (rows < end)
        d_loc = jnp.where(own[:, None], c2_rows, d_loc)
        t0 = mo.mul_mod(d_loc, tabs.keys_b[j], bqlp.q, bqlp.r32,
                        bqlp.r32_sh, bqlp.m32)
        t1 = mo.mul_mod(d_loc, tabs.keys_a[j], bqlp.q, bqlp.r32,
                        bqlp.r32_sh, bqlp.m32)
        ext0 = t0 if ext0 is None else mo.add_mod(ext0, t0, bqlp.q)
        ext1 = t1 if ext1 is None else mo.add_mod(ext1, t1, bqlp.q)

    # ---- ApproxModDown: gather P-part coefficients --------------------
    def mod_down(ext):
        ext_all = jax.lax.all_gather(ext, limb_axis, tiled=True)  # [kqlp, N]
        p_part = ext_all[kql:]
        p_coeff = _ntt_inv_vpu(p_part, tabs.basis_p)
        p_coeff = mo.mul_mod_shoup(p_coeff, tabs.pscale, tabs.pscale_sh,
                                   tabs.basis_p.q)
        conv = _conv_rows(p_coeff, tabs.pconv_w, tabs.pconv_w_sh, bql.q)
        s = _ntt_fwd_vpu(conv, bql)
        idx = jax.lax.axis_index(limb_axis)
        kql_loc = a0.shape[0]
        # this device's Q rows in the ql layout (valid: Q rows come first
        # in ext_all and idx*kql_loc + kql_loc <= kql by divisibility)
        xq = jax.lax.dynamic_slice_in_dim(ext_all, idx * kql_loc, kql_loc,
                                          axis=0)
        d = mo.sub_mod(xq, s, bql.q)
        return mo.mul_mod_shoup(d, tabs.pinv, tabs.pinv_sh, bql.q)

    d0 = mod_down(ext0)
    d1 = mod_down(ext1)
    return (mo.add_mod(c0, d0, bql.q), mo.add_mod(c1, d1, bql.q))


def require_divisible(tabs: ShardedMultTables, limb: int):
    if tabs.kql % limb or (tabs.kql + tabs.kp) % limb:
        raise ValueError(
            f"limb axis {limb} must divide kql={tabs.kql} and "
            f"kqlp={tabs.kql + tabs.kp}; size the modulus chain to the mesh")
