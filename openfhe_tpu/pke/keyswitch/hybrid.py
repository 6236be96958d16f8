"""HYBRID (GHS) key switching — the hottest non-NTT path.

Reference analog: /root/reference src/pke/lib/keyswitch/keyswitch-hybrid.cpp
(KeySwitchGenInternal :60-130, EvalKeySwitchPrecomputeCore,
EvalFastKeySwitchCore(Ext), ApproxModDown epilogue) and the partition tables
in CryptoParametersRNS (rns-cryptoparameters.h:267-376).

Recipe (eprint 2021/204 appendix):
  * KeyGen digit j: b_j = -a_j*s_new + ns*e_j + P*s_old*mask_j over QP, where
    mask_j zeroes every tower outside digit j — the CRT mask replaces any
    explicit QHat factor.
  * Switch: digit j of ciphertext c = raw extension of [c]_{Q_j} from the
    digit's towers to the full Q_l*P basis (ApproxModUp); inner product with
    the key digits; ApproxModDown divides by P.

TPU-first: digits are `[k, N]` tensors; the per-digit OpenMP loops become
batched tensor ops; the digit inner product is a statically unrolled
multiply-accumulate that XLA fuses. Multi-chip: the tower axis shards over
the mesh; ApproxSwitchCRTBasis is the only cross-tower mixing point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from openfhe_tpu.lattice.basis import Basis
from openfhe_tpu.lattice import rns_tools as rt
from openfhe_tpu.math import modops as mo
from openfhe_tpu.math import sampling
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from openfhe_tpu.pke.keys import EvalKey, PrivateKey


@struct.dataclass
class PartTables:
    """Per-digit conversion tables at one level."""
    switch: rt.SwitchTables
    digit_basis: Basis
    compl_basis: Basis
    start: int = struct.field(pytree_node=False)
    end: int = struct.field(pytree_node=False)


@struct.dataclass
class HybridTables:
    """All hybrid-KS tables for one ciphertext level (sizeQl towers)."""
    parts: tuple                 # tuple[PartTables]
    moddown: rt.ModDownTables
    basis_ql: Basis
    basis_p: Basis
    basis_qlp: Basis
    fused: object = None         # ks_fused.FusedKSTables on TPU, else None
    size_ql: int = struct.field(pytree_node=False, default=0)
    k_q_full: int = struct.field(pytree_node=False, default=0)


def make_hybrid_tables(basis_q: Basis, basis_p: Basis, size_ql: int,
                       num_parts_full: int, ns_int: int = 1) -> HybridTables:
    """Host precompute for level with `size_ql` towers (reference:
    rns-cryptoparameters.h m_paramsPartQ / m_paramsComplPartQ tables)."""
    k_full = len(basis_q.moduli)
    alpha = -(-k_full // num_parts_full)
    q_mods = basis_q.moduli[:size_ql]
    p_mods = basis_p.moduli
    basis_ql = basis_q.slice(0, size_ql)
    num_parts = min(-(-size_ql // alpha), num_parts_full)
    parts = []
    for j in range(num_parts):
        start = j * alpha
        end = min(start + alpha, size_ql)
        digit_mods = q_mods[start:end]
        compl_mods = q_mods[:start] + q_mods[end:] + p_mods
        digit_basis = basis_q.slice(start, end)
        compl_basis = (basis_q.slice(0, start)
                       .concat(basis_q.slice(end, size_ql))
                       .concat(basis_p))
        parts.append(PartTables(
            switch=rt.make_switch_tables(digit_mods, compl_mods),
            digit_basis=digit_basis, compl_basis=compl_basis,
            start=start, end=end))
    from openfhe_tpu.pke.keyswitch import ks_fused
    fused = None
    if ks_fused.supported(list(basis_q.moduli) + list(p_mods),
                          basis_q.ring_dim):
        fused = ks_fused.make_fused_ks_tables(
            basis_q.moduli, p_mods, size_ql, num_parts_full,
            basis_q.ring_dim, k_full, ns_int=ns_int,
            pad_to=ks_fused.bucket_size(size_ql, k_full))
    return HybridTables(
        parts=tuple(parts),
        moddown=rt.make_mod_down_tables(p_mods, q_mods, t=ns_int),
        basis_ql=basis_ql, basis_p=basis_p,
        basis_qlp=basis_ql.concat(basis_p),
        fused=fused,
        size_ql=size_ql, k_q_full=k_full)


def keyswitch_gen(rng, s_old: PrivateKey, s_new: PrivateKey,
                  basis_qp: Basis, k_q: int, num_parts: int,
                  p_modq, p_modq_sh, ns_int: int = 1) -> EvalKey:
    """Generate the hybrid KS key s_old -> s_new over QP.

    p_modq(+_sh): [P mod q_i] per Q tower, zero-padded over P towers.
    ns_int: noise scale (1 for CKKS/BFV, plaintext modulus t for BGV).
    """
    k_qp = len(basis_qp.moduli)
    n = basis_qp.ring_dim
    alpha = -(-k_q // num_parts)
    bs, as_ = [], []
    for part in range(num_parts):
        rng, k1, k2 = jax.random.split(rng, 3)
        a = sampling.uniform_residues(k1, basis_qp)            # EVAL-uniform
        e = sampling.to_residues(
            sampling.discrete_gaussian(k2, (n,)), basis_qp)
        e = ntt_fwd(e, basis_qp)
        if ns_int != 1:
            ns_c, ns_sh = rt._shoup_pair(
                [ns_int % q for q in basis_qp.moduli], basis_qp.moduli)
            e = mo.mul_mod_shoup(e, ns_c, ns_sh, basis_qp.q)
        b = mo.sub_mod(e, mo.mul_mod(a, s_new.s_qp, basis_qp.q, basis_qp.r32,
                                     basis_qp.r32_sh, basis_qp.m32),
                       basis_qp.q)
        # + P * s_old on this digit's towers only (the CRT mask)
        start, end = alpha * part, min(alpha * (part + 1), k_q)
        ps_old = mo.mul_mod_shoup(s_old.s_qp, p_modq, p_modq_sh, basis_qp.q)
        row_ids = jnp.arange(k_qp)[:, None]
        mask = (row_ids >= start) & (row_ids < end)
        b = jnp.where(mask, mo.add_mod(b, ps_old, basis_qp.q), b)
        bs.append(b)
        as_.append(a)
    ek = EvalKey(bv=jnp.stack(bs), av=jnp.stack(as_),
                 key_tag=s_new.key_tag)
    return shoup_companions(ek, basis_qp.moduli)


def keyswitch_gen_pk(rng, s_old: PrivateKey, new_pk, basis_qp: Basis,
                     k_q: int, num_parts: int, p_modq, p_modq_sh,
                     ns_int: int = 1,
                     secret_key_dist=None) -> EvalKey:
    """PK-based hybrid KS keygen (reference keyswitch-hybrid.cpp second
    overload): digit j is an encryption of P*s_old*mask_j under new_pk —
    used by unidirectional PRE's ReKeyGen (no access to the new secret)."""
    k_qp = len(basis_qp.moduli)
    n = basis_qp.ring_dim
    alpha = -(-k_q // num_parts)
    mm = lambda x, y: mo.mul_mod(x, y, basis_qp.q, basis_qp.r32,
                                 basis_qp.r32_sh, basis_qp.m32)
    bs, as_ = [], []
    for part in range(num_parts):
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        u = ntt_fwd(sampling.to_residues(
            sampling.ternary(k1, (n,)), basis_qp), basis_qp)
        e0 = ntt_fwd(sampling.to_residues(
            sampling.discrete_gaussian(k2, (n,)), basis_qp), basis_qp)
        e1 = ntt_fwd(sampling.to_residues(
            sampling.discrete_gaussian(k3, (n,)), basis_qp), basis_qp)
        if ns_int != 1:
            c, c_sh = rt._shoup_pair(
                [ns_int % q for q in basis_qp.moduli], basis_qp.moduli)
            e0 = mo.mul_mod_shoup(e0, c, c_sh, basis_qp.q)
            e1 = mo.mul_mod_shoup(e1, c, c_sh, basis_qp.q)
        a = mo.add_mod(mm(new_pk.a, u), e1, basis_qp.q)
        b = mo.add_mod(mm(new_pk.b, u), e0, basis_qp.q)
        start, end = alpha * part, min(alpha * (part + 1), k_q)
        ps_old = mo.mul_mod_shoup(s_old.s_qp, p_modq, p_modq_sh, basis_qp.q)
        row_ids = jnp.arange(k_qp)[:, None]
        mask = (row_ids >= start) & (row_ids < end)
        b = jnp.where(mask, mo.add_mod(b, ps_old, basis_qp.q), b)
        bs.append(b)
        as_.append(a)
    ek = EvalKey(bv=jnp.stack(bs), av=jnp.stack(as_),
                 key_tag=new_pk.key_tag)
    return shoup_companions(ek, basis_qp.moduli)


def _decompose_digits(c: jnp.ndarray, tabs: HybridTables) -> list:
    """EvalKeySwitchPrecomputeCore: per digit, extend [c]_{Q_j} to Q_l*P.

    c: [kQl, N] EVAL. Returns list of [kQl + kP, N] EVAL tensors.
    """
    size_ql = tabs.size_ql
    digits = []
    for pt in tabs.parts:
        own_eval = c[pt.start:pt.end]
        own_coeff = ntt_inv(own_eval, pt.digit_basis)
        conv = rt.switch_crt_basis_approx(own_coeff, pt.digit_basis,
                                          pt.compl_basis, pt.switch)
        conv = ntt_fwd(conv, pt.compl_basis)
        n_before = pt.start
        n_after = size_ql - pt.end
        pieces = [conv[:n_before], own_eval,
                  conv[n_before:n_before + n_after], conv[n_before + n_after:]]
        digits.append(jnp.concatenate([p for p in pieces if p.shape[0] > 0],
                                      axis=0))
    return digits


def _fast_core_ext(digits: list, ek: EvalKey, tabs: HybridTables):
    """EvalFastKeySwitchCoreExt: (sum_j d_j*b_j, sum_j d_j*a_j) over Q_l*P."""
    bqlp = tabs.basis_qlp
    size_ql, k_q_full = tabs.size_ql, tabs.k_q_full

    def key_slice(arr, j):
        return jnp.concatenate([arr[j, :size_ql], arr[j, k_q_full:]], axis=0)

    acc0 = acc1 = None
    for j, d in enumerate(digits):
        t0 = mo.mul_mod(d, key_slice(ek.bv, j), bqlp.q, bqlp.r32,
                        bqlp.r32_sh, bqlp.m32)
        t1 = mo.mul_mod(d, key_slice(ek.av, j), bqlp.q, bqlp.r32,
                        bqlp.r32_sh, bqlp.m32)
        acc0 = t0 if acc0 is None else mo.add_mod(acc0, t0, bqlp.q)
        acc1 = t1 if acc1 is None else mo.add_mod(acc1, t1, bqlp.q)
    return acc0, acc1


def shoup_companions(ek: EvalKey, moduli_qp) -> EvalKey:
    """Attach per-element Shoup companions floor(v * 2^32 / q), enabling
    the fused kernels' constant-multiply key product.

    Computed ON DEVICE by long division in chunks of (32 - modulus bits)
    quotient bits (shift/div/mul/sub; remainders < q keep every
    intermediate in uint32) — the former numpy version round-tripped the
    whole eval key through the host (2 x ~nd*kQP*N words), which
    dominated keygen."""
    mods = [int(m) for m in moduli_qp]
    # numpy (not device) constant: a device array closed over by jit is
    # fetched back to host during lowering to embed as an MLIR constant
    q = np.array(mods, np.uint32).reshape(1, -1, 1)
    chunk = max(1, 32 - max(mods).bit_length())
    bits = [chunk] * (32 // chunk)
    if sum(bits) < 32:
        bits.append(32 - sum(bits))

    @jax.jit
    def sh(v):
        quot = jnp.zeros_like(v)
        rem = v
        for b in bits:
            acc = rem << b                    # rem < q -> fits uint32
            dig = acc // q
            rem = acc - dig * q
            quot = (quot << b) | dig
        return quot

    return EvalKey(bv=ek.bv, av=ek.av, bv_sh=sh(ek.bv), av_sh=sh(ek.av),
                   key_tag=ek.key_tag)


@jax.jit
def keyswitch_core(c: jnp.ndarray, ek: EvalKey, tabs: HybridTables):
    """Full KeySwitchCore on one polynomial (usually ct[last]):
    returns (delta0, delta1) over Q_l in EVAL.

    Dispatches to the fused pallas path (pke/keyswitch/ks_fused.py) when
    the level tables carry fused tables and the key has Shoup companions;
    otherwise runs the XLA-op reference chain."""
    if tabs.fused is not None and ek.bv_sh is not None:
        from openfhe_tpu.pke.keyswitch import ks_fused
        return ks_fused.keyswitch_core_fused(
            c, ek.bv, ek.av, ek.bv_sh, ek.av_sh, tabs.fused)
    digits = _decompose_digits(c, tabs)
    ext0, ext1 = _fast_core_ext(digits, ek, tabs)
    size_ql = tabs.size_ql
    out0 = rt.approx_mod_down(ext0[:size_ql], ext0[size_ql:], tabs.basis_ql,
                              tabs.basis_p, tabs.moddown)
    out1 = rt.approx_mod_down(ext1[:size_ql], ext1[size_ql:], tabs.basis_ql,
                              tabs.basis_p, tabs.moddown)
    return out0, out1


def eval_fast_rotation_precompute(c1: jnp.ndarray, tabs: HybridTables):
    """Hoisted digit decomposition (reference EvalFastRotationPrecompute,
    keyswitch-hybrid.cpp EvalKeySwitchPrecomputeCore): the expensive
    ApproxModUp runs once per ciphertext and is shared by every rotation."""
    return _decompose_digits(c1, tabs)


def raise_c0_ext(c0: jnp.ndarray, p_modq, p_modq_sh,
                 tabs: HybridTables) -> jnp.ndarray:
    """[c0]_{Q_l} -> [P*c0]_{Q_l*P} (reference KeySwitchExt,
    keyswitch-hybrid.cpp): P*c0 is 0 mod every P tower, and
    (P mod q_i)*c0 on the Q towers."""
    size_ql = tabs.size_ql
    pc0 = mo.mul_mod_shoup(c0, p_modq[:size_ql], p_modq_sh[:size_ql],
                           tabs.basis_ql.q)
    kp = len(tabs.basis_p.moduli)
    zeros = jnp.zeros((kp,) + c0.shape[1:], c0.dtype)
    return jnp.concatenate([pc0, zeros], axis=0)


def eval_fast_rotation_core_ext(digits: list, g: int, ek,
                                tabs: HybridTables, ring_dim: int):
    """Hoisted rotation WITHOUT the ApproxModDown epilogue (reference
    EvalFastRotationExt): returns the (b, a) pair over Q_l*P so many
    rotations can be accumulated with one final mod-down."""
    from openfhe_tpu.lattice.automorph import eval_indices
    idx = jnp.asarray(eval_indices(ring_dim, g))
    rot_digits = [jnp.take(d, idx, axis=-1) for d in digits]
    return _fast_core_ext(rot_digits, ek, tabs)


def mod_down_pair(ext0: jnp.ndarray, ext1: jnp.ndarray,
                  tabs: HybridTables):
    """(reference KeySwitchDown): ApproxModDown both elements of an
    extended-basis ciphertext back to Q_l."""
    size_ql = tabs.size_ql
    out0 = rt.approx_mod_down(ext0[:size_ql], ext0[size_ql:], tabs.basis_ql,
                              tabs.basis_p, tabs.moddown)
    out1 = rt.approx_mod_down(ext1[:size_ql], ext1[size_ql:], tabs.basis_ql,
                              tabs.basis_p, tabs.moddown)
    return out0, out1


def mod_down_first(ext0: jnp.ndarray, tabs: HybridTables) -> jnp.ndarray:
    """(reference KeySwitchDownFirstElement)"""
    size_ql = tabs.size_ql
    return rt.approx_mod_down(ext0[:size_ql], ext0[size_ql:], tabs.basis_ql,
                              tabs.basis_p, tabs.moddown)


def eval_fast_rotation_core(digits: list, g: int, ek, tabs: HybridTables,
                            ring_dim: int):
    """Rotation-by-g keyswitch on hoisted digits (reference
    EvalFastRotationExt): the automorphism permutes the extended digits
    (sigma_g commutes with the CRT mod-up), then the usual inner product
    and ApproxModDown."""
    from openfhe_tpu.lattice.automorph import eval_indices
    idx = jnp.asarray(eval_indices(ring_dim, g))
    rot_digits = [jnp.take(d, idx, axis=-1) for d in digits]
    ext0, ext1 = _fast_core_ext(rot_digits, ek, tabs)
    size_ql = tabs.size_ql
    out0 = rt.approx_mod_down(ext0[:size_ql], ext0[size_ql:], tabs.basis_ql,
                              tabs.basis_p, tabs.moddown)
    out1 = rt.approx_mod_down(ext1[:size_ql], ext1[size_ql:], tabs.basis_ql,
                              tabs.basis_p, tabs.moddown)
    return out0, out1
