"""BV key switching (RNS digit decomposition, no auxiliary modulus).

Reference analog: /root/reference src/pke/lib/keyswitch/keyswitch-bv.cpp
(KeySwitchBV, keyswitch-bv.h:114): the ciphertext polynomial is decomposed
into its per-tower CRT components; the switch key holds, per tower i, an
encryption of s_old * [Q/q_i * (Q/q_i)^{-1}]_Q (the CRT unit mask) under
s_new. Key switching is the inner product of the extended components with
the key rows — no ApproxModDown epilogue.

TPU-first: the per-tower extension reuses the (exact for single-tower
inputs) CRT basis switch; the digit inner product is a fused
multiply-accumulate over the tower axis. BV trades the hybrid method's
extra NTTs over P for noise growth ~ q_i — the reference keeps both, and
so do we (KeySwitchTechnique.BV / HYBRID in CCParams).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from openfhe_tpu.lattice import rns_tools as rt
from openfhe_tpu.lattice.basis import Basis
from openfhe_tpu.math import modops as mo
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from openfhe_tpu.pke.keys import EvalKey, PrivateKey


@struct.dataclass
class BVPart:
    switch: rt.SwitchTables
    digit_basis: Basis
    compl_basis: Basis
    idx: int = struct.field(pytree_node=False)


@struct.dataclass
class BVTables:
    parts: tuple
    basis_ql: Basis
    size_ql: int = struct.field(pytree_node=False)


def make_bv_tables(basis_q: Basis, size_ql: int) -> BVTables:
    mods = basis_q.moduli[:size_ql]
    parts = []
    for i in range(size_ql):
        compl_mods = mods[:i] + mods[i + 1:]
        parts.append(BVPart(
            switch=rt.make_switch_tables((mods[i],), compl_mods),
            digit_basis=basis_q.slice(i, i + 1),
            compl_basis=(basis_q.slice(0, i)
                         .concat(basis_q.slice(i + 1, size_ql))),
            idx=i))
    return BVTables(parts=tuple(parts), basis_ql=basis_q.slice(0, size_ql),
                    size_ql=size_ql)


def _digit_count(basis_q: Basis, k_q: int, digit_size: int) -> int:
    import math
    max_bits = max(int(q).bit_length() for q in basis_q.moduli[:k_q])
    return int(math.ceil(max_bits / digit_size))


def keyswitch_gen(rng, s_old: PrivateKey, s_new: PrivateKey,
                  basis_q: Basis, k_q: int, ns_int: int = 1,
                  digit_size: int = 0) -> EvalKey:
    """Switch key rows (keyswitch-bv.cpp KeyGen).

    digit_size == 0: one row per tower, message s_old * CRTunit_i (pure RNS
    decomposition — noise ~ q_i, only usable on deg-2 components).
    digit_size  = w: rows (i, t) with message s_old * 2^(w*t) * CRTunit_i
    (the reference's relinWindow), noise ~ 2^w.
    """
    from openfhe_tpu.pke.keyswitch import hybrid
    if digit_size == 0:
        ones = [1] * k_q
        p_modq, p_modq_sh = rt._shoup_pair(ones, basis_q.moduli[:k_q])
        # reuse the hybrid generator with one part per tower and P = 1
        return hybrid.keyswitch_gen(rng, s_old, s_new, basis_q, k_q,
                                    num_parts=k_q, p_modq=p_modq,
                                    p_modq_sh=p_modq_sh, ns_int=ns_int)
    from openfhe_tpu.math import sampling
    d_cnt = _digit_count(basis_q, k_q, digit_size)
    n = basis_q.ring_dim
    bs, as_ = [], []
    mm = lambda x, y: mo.mul_mod(x, y, basis_q.q, basis_q.r32,
                                 basis_q.r32_sh, basis_q.m32)
    for i in range(k_q):
        for t in range(d_cnt):
            rng, k1, k2 = jax.random.split(rng, 3)
            a = sampling.uniform_residues(k1, basis_q)
            e = ntt_fwd(sampling.to_residues(
                sampling.discrete_gaussian(k2, (n,)), basis_q), basis_q)
            if ns_int != 1:
                c, c_sh = rt._shoup_pair(
                    [ns_int % q for q in basis_q.moduli], basis_q.moduli)
                e = mo.mul_mod_shoup(e, c, c_sh, basis_q.q)
            b = mo.sub_mod(e, mm(a, s_new.s_qp), basis_q.q)
            fac = [(1 << (digit_size * t)) % q if j == i else 0
                   for j, q in enumerate(basis_q.moduli)]
            fc, fc_sh = rt._shoup_pair(fac, basis_q.moduli)
            b = mo.add_mod(b, mo.mul_mod_shoup(s_old.s_qp, fc, fc_sh,
                                               basis_q.q), basis_q.q)
            bs.append(b)
            as_.append(a)
    return EvalKey(bv=jnp.stack(bs), av=jnp.stack(as_),
                   key_tag=s_new.key_tag)


def keyswitch_core_digits(c: jnp.ndarray, ek: EvalKey, basis_ql: Basis,
                          digit_size: int, d_cnt_full: int,
                          k_q_full: int):
    """Digit-decomposed BV switch: c's per-tower residues are split into
    base-2^w digits; each (tower, digit) row multiplies its key. Digits are
    < 2^w, so their RNS extension is a broadcast (no CRT switch)."""
    size_ql = c.shape[-2]
    c_coeff = ntt_inv(c, basis_ql)                        # [kql, N]
    mask = jnp.uint32((1 << digit_size) - 1)
    acc0 = acc1 = None
    for i in range(size_ql):
        row = c_coeff[i]
        for t in range(d_cnt_full):
            d = (row >> jnp.uint32(digit_size * t)) & mask     # [N]
            d_eval = ntt_fwd(jnp.broadcast_to(d, (size_ql,) + d.shape),
                             basis_ql)
            key_b = ek.bv[i * d_cnt_full + t, :size_ql]
            key_a = ek.av[i * d_cnt_full + t, :size_ql]
            t0 = mo.mul_mod(d_eval, key_b, basis_ql.q, basis_ql.r32,
                            basis_ql.r32_sh, basis_ql.m32)
            t1 = mo.mul_mod(d_eval, key_a, basis_ql.q, basis_ql.r32,
                            basis_ql.r32_sh, basis_ql.m32)
            acc0 = t0 if acc0 is None else mo.add_mod(acc0, t0, basis_ql.q)
            acc1 = t1 if acc1 is None else mo.add_mod(acc1, t1, basis_ql.q)
    return acc0, acc1


@jax.jit
def keyswitch_core(c: jnp.ndarray, ek: EvalKey, tabs: BVTables):
    """(delta0, delta1) over Q_l for one polynomial in EVAL format."""
    size_ql = tabs.size_ql
    bql = tabs.basis_ql
    acc0 = acc1 = None
    for pt in tabs.parts:
        own_eval = c[pt.idx:pt.idx + 1]
        own_coeff = ntt_inv(own_eval, pt.digit_basis)
        conv = rt.switch_crt_basis_approx(own_coeff, pt.digit_basis,
                                          pt.compl_basis, pt.switch)
        conv = ntt_fwd(conv, pt.compl_basis)
        digit = jnp.concatenate(
            [conv[:pt.idx], own_eval, conv[pt.idx:]], axis=0)
        key_b = ek.bv[pt.idx, :size_ql]
        key_a = ek.av[pt.idx, :size_ql]
        t0 = mo.mul_mod(digit, key_b, bql.q, bql.r32, bql.r32_sh, bql.m32)
        t1 = mo.mul_mod(digit, key_a, bql.q, bql.r32, bql.r32_sh, bql.m32)
        acc0 = t0 if acc0 is None else mo.add_mod(acc0, t0, bql.q)
        acc1 = t1 if acc1 is None else mo.add_mod(acc1, t1, bql.q)
    return acc0, acc1
