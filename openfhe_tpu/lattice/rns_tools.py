"""RNS base-conversion machinery: tables (host) + device kernels.

TPU-native replacement for the reference's DCRTPoly RNS conversions
(/root/reference src/core/include/lattice/hal/default/dcrtpoly.h:231-313:
ApproxSwitchCRTBasis / ApproxModUp / ApproxModDown / SwitchCRTBasis /
ScaleAndRound / DropLastElementAndScale, impls in dcrtpoly-impl.h) and the
constant precomputation in CryptoParametersRNS::PrecomputeCRTTables
(src/pke/include/schemerns/rns-cryptoparameters.h:177).

Kernel shape: a base conversion is a tiny contraction over the tower axis —
out[j] = sum_i f(x[i]) * C[i, j] mod p_j. We keep residues canonical and use
Shoup constant-multiplies with a statically unrolled accumulation over the
input towers; each (product, add, renorm) stays in uint32 and XLA fuses the
chain. (A future MXU path decomposes into 8-bit limb matmuls.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from openfhe_tpu.lattice.basis import Basis
from openfhe_tpu.lattice.dcrt import COEFF, EVAL, Poly
from openfhe_tpu.math import modops as mo
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv


def _u32_col(vals) -> jnp.ndarray:
    return jnp.asarray(np.array(vals, np.uint32).reshape(-1, 1))


def _shoup_pair(vals, mods):
    """(c, c_shoup) column arrays for per-tower constants."""
    c = np.array(vals, np.uint64)
    q = np.array(mods, np.uint64)
    sh = (c << np.uint64(32)) // q
    return (jnp.asarray(c.astype(np.uint32).reshape(-1, 1)),
            jnp.asarray(sh.astype(np.uint32).reshape(-1, 1)))


@struct.dataclass
class SwitchTables:
    """Tables for CRT basis switch B -> D (approx and exact variants).

    bhat_inv[i]    = [ (B/b_i)^{-1} ]_{b_i}          (applied to x_i first)
    bhat_mod_d[i]  = [ B/b_i ]_{d_j} as [k_in, k_out, 1]
    b_mod_d        = [ B ]_{d_j} (+ shoup)            (for the exact variant)
    b_inv_f32[i]   = 1 / b_i as f32                   (overflow-count estimate)
    w_limbs etc.   = int8 limb form of bhat_mod_d^T + per-output-row modular
                     constants, driving the MXU matmul path (ops/modmatmul)
    """
    bhat_inv: jnp.ndarray
    bhat_inv_sh: jnp.ndarray
    bhat_mod_d: jnp.ndarray
    bhat_mod_d_sh: jnp.ndarray
    b_mod_d: jnp.ndarray
    b_mod_d_sh: jnp.ndarray
    b_inv_f32: jnp.ndarray
    w_limbs: jnp.ndarray = None
    rm_q: jnp.ndarray = None
    rm_pow: jnp.ndarray = None
    rm_pow_sh: jnp.ndarray = None
    rm_r32pow: jnp.ndarray = None


def make_switch_tables(from_moduli, to_moduli) -> SwitchTables:
    from openfhe_tpu.ops import modmatmul as mmx
    kb, kd = len(from_moduli), len(to_moduli)
    big_b = 1
    for b in from_moduli:
        big_b *= b
    bhat = [big_b // b for b in from_moduli]
    bhat_inv = [pow(h % b, -1, b) for h, b in zip(bhat, from_moduli)]
    c, c_sh = _shoup_pair(bhat_inv, from_moduli)
    mat = np.zeros((kb, kd, 1), np.uint32)
    mat_sh = np.zeros((kb, kd, 1), np.uint32)
    for i in range(kb):
        for j in range(kd):
            d = to_moduli[j]
            v = bhat[i] % d
            mat[i, j, 0] = v
            mat_sh[i, j, 0] = (v << 32) // d
    bm, bm_sh = _shoup_pair([big_b % d for d in to_moduli], to_moduli)
    rm = mmx.make_rowmod_consts(to_moduli)
    return SwitchTables(
        bhat_inv=c, bhat_inv_sh=c_sh,
        bhat_mod_d=jnp.asarray(mat), bhat_mod_d_sh=jnp.asarray(mat_sh),
        b_mod_d=bm, b_mod_d_sh=bm_sh,
        b_inv_f32=jnp.asarray(
            np.array([1.0 / b for b in from_moduli], np.float32)),
        w_limbs=jnp.asarray(mmx.balanced_limbs_host(mat[:, :, 0].T)),
        rm_q=rm["q"], rm_pow=rm["pow"], rm_pow_sh=rm["pow_sh"],
        rm_r32pow=rm["r32pow"])


def switch_crt_basis_approx(x: jnp.ndarray, in_basis: Basis,
                            out_basis: Basis, tab: SwitchTables) -> jnp.ndarray:
    """ApproxSwitchCRTBasis (dcrtpoly.h:231): out ~ x + u*B for small u >= 0.

    x: [..., k_in, N] COEFF residues in basis B; returns [..., k_out, N].
    """
    y = mo.mul_mod_shoup(x, tab.bhat_inv, tab.bhat_inv_sh, in_basis.q)
    return _accumulate_converted(y, tab, out_basis)


def _accumulate_converted(y: jnp.ndarray, tab: SwitchTables,
                          out_basis: Basis) -> jnp.ndarray:
    """sum_i y_i * [B/b_i]_{d_j} mod d_j.

    Default path: a single modular matmul over the tower axis on the MXU
    (ops/modmatmul, exact via int8 limb decomposition) — the base
    conversion IS a small matmul (SURVEY.md §2.4). Falls back to a compact
    lax.scan of Shoup multiply-accumulates when the matmul tables are
    absent (deserialized old tables)."""
    k_out = len(out_basis.moduli)
    n = y.shape[-1]
    lead = y.shape[:-2]
    if tab.w_limbs is not None:
        from openfhe_tpu.ops import modmatmul as mmx
        k_in = y.shape[-2]
        x2 = jnp.moveaxis(y, -2, 0).reshape(k_in, -1)
        consts = dict(q=tab.rm_q, pow=tab.rm_pow, pow_sh=tab.rm_pow_sh,
                      r32pow=tab.rm_r32pow)
        out = mmx.mod_matmul_rowmod(tab.w_limbs, x2, consts)
        out = out.reshape((k_out,) + lead + (n,))
        return jnp.moveaxis(out, 0, -2)
    acc0 = jnp.zeros(lead + (k_out, n), jnp.uint32)
    # move the input-tower axis to the front for scan
    ys = jnp.moveaxis(y[..., None, :], -3, 0)          # [k_in, *lead, 1, N]

    def body(acc, xs):
        yi, c, c_sh = xs
        term = mo.mul_mod_shoup(yi, c, c_sh, out_basis.q)
        return mo.add_mod(acc, term, out_basis.q), None

    acc, _ = jax.lax.scan(body, acc0,
                          (ys, tab.bhat_mod_d, tab.bhat_mod_d_sh))
    return acc


def switch_crt_basis_exact(x: jnp.ndarray, in_basis: Basis,
                           out_basis: Basis, tab: SwitchTables) -> jnp.ndarray:
    """SwitchCRTBasis (HPS, dcrtpoly.h:251): exact x mod D for x < B.

    Estimates the CRT overflow count u = round(sum_i y_i / b_i) in f32 with
    Kahan compensation (reference uses double; moduli here are < 2^31 so the
    f32 error stays well below the rounding slack for typical k).
    """
    y = mo.mul_mod_shoup(x, tab.bhat_inv, tab.bhat_inv_sh, in_basis.q)
    # overflow count: u = floor(sum y_i / b_i), 0 <= u < k_in
    frac = y.astype(jnp.float32) * tab.b_inv_f32[..., :, None]
    u = jnp.floor(jnp.sum(frac, axis=-2, keepdims=True)).astype(jnp.uint32)
    acc = _accumulate_converted(y, tab, out_basis)
    corr = mo.mul_mod_shoup(u, tab.b_mod_d, tab.b_mod_d_sh, out_basis.q)
    return mo.sub_mod(acc, corr, out_basis.q)


# ---------------------------------------------------------------------------
# ApproxModUp / ApproxModDown (hybrid key switching support,
# reference dcrtpoly.h:231-249)
# ---------------------------------------------------------------------------

@struct.dataclass
class ModDownTables:
    """P -> Q mod-down: switch tables for P->Q plus P^{-1} mod q_i.

    For BGV (noise scale t != 1) the rounding error must stay divisible by
    t (reference ApproxModDown's tInvModp/t arguments): the P-part is
    multiplied by t^{-1} mod P before conversion and by t mod Q after.
    """
    switch: SwitchTables
    pinv_modq: jnp.ndarray
    pinv_modq_sh: jnp.ndarray
    tinv_modp: jnp.ndarray | None = None
    tinv_modp_sh: jnp.ndarray | None = None
    t_modq: jnp.ndarray | None = None
    t_modq_sh: jnp.ndarray | None = None


def make_mod_down_tables(p_moduli, q_moduli, t: int = 1) -> ModDownTables:
    big_p = 1
    for p in p_moduli:
        big_p *= p
    pinv = [pow(big_p % q, -1, q) for q in q_moduli]
    c, c_sh = _shoup_pair(pinv, q_moduli)
    kw = {}
    if t != 1:
        a, a_sh = _shoup_pair([pow(t % p, -1, p) for p in p_moduli],
                              p_moduli)
        b, b_sh = _shoup_pair([t % q for q in q_moduli], q_moduli)
        kw = dict(tinv_modp=a, tinv_modp_sh=a_sh, t_modq=b, t_modq_sh=b_sh)
    return ModDownTables(switch=make_switch_tables(p_moduli, q_moduli),
                         pinv_modq=c, pinv_modq_sh=c_sh, **kw)


def approx_mod_down(x_q: jnp.ndarray, x_p: jnp.ndarray, q_basis: Basis,
                    p_basis: Basis, tab: ModDownTables,
                    fmt: int = EVAL) -> jnp.ndarray:
    """(x - [x]_P) / P over Q: the hybrid-KS epilogue (dcrtpoly.h:249).

    x_q: [..., kq, N], x_p: [..., kp, N], both in `fmt`. Returns [..., kq, N].
    """
    if fmt == EVAL:
        x_p_coeff = ntt_inv(x_p, p_basis)
    else:
        x_p_coeff = x_p
    if tab.tinv_modp is not None:
        x_p_coeff = mo.mul_mod_shoup(x_p_coeff, tab.tinv_modp,
                                     tab.tinv_modp_sh, p_basis.q)
    conv = switch_crt_basis_approx(x_p_coeff, p_basis, q_basis, tab.switch)
    if tab.t_modq is not None:
        conv = mo.mul_mod_shoup(conv, tab.t_modq, tab.t_modq_sh, q_basis.q)
    if fmt == EVAL:
        conv = ntt_fwd(conv, q_basis)
    diff = mo.sub_mod(x_q, conv, q_basis.q)
    return mo.mul_mod_shoup(diff, tab.pinv_modq, tab.pinv_modq_sh, q_basis.q)


# ---------------------------------------------------------------------------
# DropLastElementAndScale — CKKS rescale / BGV-CKKS ModReduce core
# (reference dcrtpoly-interface.h:816-848)
# ---------------------------------------------------------------------------

@struct.dataclass
class DropScaleTables:
    """For dropping tower l: q_l^{-1} mod q_i (i < l) and q_l mod q_i."""
    qlinv: jnp.ndarray
    qlinv_sh: jnp.ndarray
    ql_mod_qi: jnp.ndarray     # [q_l]_{q_i} used to reduce the dropped tower
    ql_mod_qi_sh: jnp.ndarray
    ql_half: int = struct.field(pytree_node=False)  # floor(q_l/2) for rounding
    ql_half_modqi: jnp.ndarray
    ql_half_modqi_sh: jnp.ndarray


def make_drop_scale_tables(moduli) -> DropScaleTables:
    """Tables for dropping the last modulus of `moduli`."""
    ql = moduli[-1]
    rest = moduli[:-1]
    qlinv = [pow(ql % q, -1, q) for q in rest]
    a, a_sh = _shoup_pair(qlinv, rest)
    b, b_sh = _shoup_pair([ql % q for q in rest], rest)
    h = ql >> 1
    c, c_sh = _shoup_pair([h % q for q in rest], rest)
    return DropScaleTables(qlinv=a, qlinv_sh=a_sh, ql_mod_qi=b,
                           ql_mod_qi_sh=b_sh, ql_half=h,
                           ql_half_modqi=c, ql_half_modqi_sh=c_sh)


@jax.jit
def drop_last_and_scale(x: Poly, basis: Basis, tab: DropScaleTables) -> Poly:
    """round(x / q_l) over Q_{l-1} per coefficient (CKKS rescale step).

    Works in EVAL: only the dropped tower round-trips through COEFF, like the
    reference's DropLastElementAndScale. Per coefficient c:
        round(c/ql) = (c + h - [c + h]_{ql}) / ql,   h = floor(ql/2)
    so per remaining tower i we form w = ([u + h]_{ql} - h) mod q_i in COEFF
    (u = last tower), transform it, and compute (x_i - w) * ql^{-1} mod q_i
    — the +h on the numerator and inside w cancel.
    """
    kq = x.data.shape[-2]
    sub_basis = basis.slice(0, kq - 1)
    last_basis = basis.slice(kq - 1, kq)
    x_rest = x.data[..., :kq - 1, :]
    x_last = x.data[..., kq - 1:, :]
    u = ntt_inv(x_last, last_basis) if x.fmt == EVAL else x_last
    u_shift = mo.add_mod(u, jnp.uint32(tab.ql_half), last_basis.q)
    # w_i = (u_shift mod q_i) - (h mod q_i), per coefficient, COEFF domain
    w = mo.barrett_u32(u_shift, sub_basis.q, sub_basis.m32)
    w = mo.sub_mod(w, tab.ql_half_modqi, sub_basis.q)
    if x.fmt == EVAL:
        w = ntt_fwd(w, sub_basis)
    diff = mo.sub_mod(x_rest, w, sub_basis.q)
    out = mo.mul_mod_shoup(diff, tab.qlinv, tab.qlinv_sh, sub_basis.q)
    return Poly(out, x.fmt)
