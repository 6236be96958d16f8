"""BGV (RNS) scheme specifics.

Reference analog: /root/reference src/pke/lib/scheme/bgvrns/* —
bgvrns-leveledshe.cpp (mod reduction with plaintext-modulus correction),
bgvrns-parametergeneration.cpp (noise-driven modulus sizing).

TPU-first divergences:
  * 32-bit lanes cap moduli at 2^31, so one "multiplicative level" spans
    `drops_per_level` towers (the reference sizes single 40-60 bit moduli
    per level instead); auto rescaling drops that many towers at once.
  * The mod-reduce message factor q_l^{-1} mod t is tracked per ciphertext
    in `scale_int` (reference: m_scalingFactorInt / FLEXIBLE correction)
    and divided out at decryption and plaintext-encode time.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct

from openfhe_tpu.lattice import rns_tools as rt
from openfhe_tpu.lattice.basis import Basis
from openfhe_tpu.math import crt
from openfhe_tpu.math import modops as mo
from openfhe_tpu.math import nbtheory
from openfhe_tpu.ops.ntt import ntt_fwd
from openfhe_tpu.pke import parameters as prm
from openfhe_tpu.pke.ciphertext import Ciphertext, Plaintext


def init_context(cc) -> None:
    p = cc.params
    t = p.plaintext_modulus
    if p.ring_dim == 0:
        # smallest standardized N covering the per-level chain at that N
        # (fixed-point selection, bgvrns-parametergeneration.cpp analog)
        from openfhe_tpu.pke.constants import SecurityLevel
        if p.security_level == SecurityLevel.HEStd_NotSet:
            p.ring_dim = 8192
        else:
            for cand in (1024, 2048, 4096, 8192, 16384, 32768):
                if (t - 1) % (2 * cand):
                    continue
                plb = math.log2(t) + math.log2(cand) + 16
                lvl = p.mult_depth * max(
                    1, math.ceil(plb / p.scaling_mod_size))
                est = p.first_mod_size + lvl * p.scaling_mod_size
                est += est / max(1, p.num_large_digits)   # + logP
                try:
                    prm.validate_security(p, cand, est)
                except ValueError:
                    continue
                p.ring_dim = cand
                break
            else:
                raise ValueError(
                    "no standardized ring dimension accommodates this "
                    "depth at the requested security level")
    n = cc.ring_dim = p.ring_dim
    if (t - 1) % (2 * n) != 0 or not nbtheory.is_prime(t):
        raise ValueError(
            f"plaintext modulus {t} must be prime and = 1 mod 2N for packing")
    # noise-driven tower count per multiplicative level (reference:
    # bgvrns-parametergeneration.cpp sizes one big modulus; we span several
    # <=2^31 towers)
    per_level_bits = math.log2(t) + math.log2(n) + 16
    drops = max(1, math.ceil(per_level_bits / p.scaling_mod_size))
    cc.bgv_drops_per_level = drops
    cc.L = p.mult_depth * drops
    from openfhe_tpu.pke.constants import MultipartyMode
    if p.multiparty_mode == MultipartyMode.NOISE_FLOODING_MULTIPARTY:
        # extra-limb flooding headroom (reference Threshold_FHE.md:28-40:
        # two extra 60-bit towers); equivalent bits as extra base towers
        # that mod-reduce never drops (cc.L counts droppable towers only)
        cc.bgv_flood_towers = math.ceil(128 / p.scaling_mod_size)
    else:
        cc.bgv_flood_towers = 0
    cc.L += cc.bgv_flood_towers
    moduli = prm._distinct_prime_chain(
        2 * n, [p.first_mod_size] + [p.scaling_mod_size] * cc.L)
    cc._init_common(moduli)
    cc.noise_scale_int = t
    cc.plaintext_modulus = t
    cc.slots = n
    cc.delta = 1.0
    # drop-scale tables with mod-t correction, keyed by sizeQl
    cc._bgv_drop_cache = {}


@struct.dataclass
class BGVDropTables:
    base: rt.DropScaleTables
    tinv_modql: jnp.ndarray        # [t^{-1}]_{q_l} (scalar as [1,1])
    tinv_modql_sh: jnp.ndarray
    t_modqi: jnp.ndarray           # [t]_{q_i} per remaining tower
    t_modqi_sh: jnp.ndarray


def make_bgv_drop_tables(moduli, t: int) -> BGVDropTables:
    ql = moduli[-1]
    rest = moduli[:-1]
    a, a_sh = rt._shoup_pair([pow(t % ql, -1, ql)], [ql])
    b, b_sh = rt._shoup_pair([t % q for q in rest], rest)
    return BGVDropTables(base=rt.make_drop_scale_tables(moduli),
                         tinv_modql=a, tinv_modql_sh=a_sh,
                         t_modqi=b, t_modqi_sh=b_sh)


def drop_last_and_scale_bgv(x: jnp.ndarray, basis: Basis,
                            tab: BGVDropTables) -> jnp.ndarray:
    """Exact BGV mod reduce of one tower: c' = (c - delta)/q_l with
    delta = t*[u*t^{-1}]_{q_l} = u (mod q_l), 0 (mod t). EVAL in/out."""
    from openfhe_tpu.ops.ntt import ntt_inv
    kq = x.shape[-2]
    sub_basis = basis.slice(0, kq - 1)
    last_basis = basis.slice(kq - 1, kq)
    u = ntt_inv(x[..., kq - 1:, :], last_basis)
    v = mo.mul_mod_shoup(u, tab.tinv_modql, tab.tinv_modql_sh, last_basis.q)
    v_qi = mo.barrett_u32(v, sub_basis.q, sub_basis.m32)
    w = mo.mul_mod_shoup(v_qi, tab.t_modqi, tab.t_modqi_sh, sub_basis.q)
    w = ntt_fwd(w, sub_basis)
    diff = mo.sub_mod(x[..., :kq - 1, :], w, sub_basis.q)
    return mo.mul_mod_shoup(diff, tab.base.qlinv, tab.base.qlinv_sh,
                            sub_basis.q)


import jax as _jax


@_jax.jit
def _k_bgv_drop_chain(elems, steps):
    for basis, tab in steps:
        elems = tuple(drop_last_and_scale_bgv(c, basis, tab)
                      for c in elems)
    return elems


def mod_reduce(cc, ct: Ciphertext, levels: int | None = None) -> Ciphertext:
    t = cc.plaintext_modulus
    levels = levels if levels is not None else cc.bgv_drops_per_level
    # collect the whole drop chain, run it as ONE jitted dispatch (the
    # eager per-op API is the product surface; see context._k_rescale)
    steps = []
    scale_int = ct.scale_int
    level = ct.level
    for i in range(levels):
        size = cc.size_ql(level + i)
        key = size
        if key not in cc._bgv_drop_cache:
            cc._bgv_drop_cache[key] = make_bgv_drop_tables(
                tuple(cc.moduli_q[:size]), t)
        steps.append((cc.basis_at(level + i), cc._bgv_drop_cache[key]))
        ql = cc.moduli_q[size - 1]
        scale_int = (scale_int * pow(ql % t, -1, t)) % t
    elems = _k_bgv_drop_chain(tuple(ct.elements), tuple(steps))
    return ct.replace(elements=elems, level=level + levels,
                      noise_deg=max(1, ct.noise_deg - levels),
                      scale_int=scale_int)


def level_factor(cc, level: int) -> int:
    """Accumulated message factor prod(q_dropped^{-1}) mod t at `level`."""
    t = cc.plaintext_modulus
    f = 1
    for i in range(level):
        ql = cc.moduli_q[len(cc.moduli_q) - 1 - i]
        f = f * pow(ql % t, -1, t) % t
    return f


def make_packed_plaintext(cc, values, level: int = 0,
                          apply_factor: bool = True,
                          noise_deg: int = 1) -> Plaintext:
    """Encode integers into slots; when `apply_factor`, pre-multiply by the
    level's mod-reduce factor so additions at that level line up."""
    from openfhe_tpu.pke.encoding.packed import encode_packed
    t = cc.plaintext_modulus
    coeffs = encode_packed(values, t, cc.ring_dim)
    f = level_factor(cc, level) if apply_factor else 1
    if f != 1:
        coeffs = coeffs * f % t
    centered = np.where(coeffs > t // 2, coeffs - t, coeffs)
    size = cc.size_ql(level)
    res = crt.to_residues_host(centered, tuple(cc.moduli_q[:size]))
    poly = ntt_fwd(jnp.asarray(res), cc.basis_at(level))
    return Plaintext(poly=poly, fmt=1, level=level, noise_deg=noise_deg,
                     scale=1.0, slots=cc.ring_dim, encoding="PACKED",
                     values=np.asarray(values), scale_int=f)


def decrypt_tail(cc, coeff_residues, ct: Ciphertext) -> Plaintext:
    t = cc.plaintext_modulus
    size = cc.size_ql(ct.level)
    centered = crt.interpolate_centered(np.asarray(coeff_residues),
                                        tuple(cc.moduli_q[:size]))
    m = np.mod(centered.astype(object), t).astype(np.int64)
    f_inv = pow(ct.scale_int % t, -1, t)
    m = m * f_inv % t
    from openfhe_tpu.pke.encoding.packed import decode_packed
    vals = decode_packed(m, t, cc.ring_dim)
    # present as signed representatives like the reference for readability
    return Plaintext(poly=coeff_residues, fmt=0, level=ct.level,
                     slots=ct.slots, encoding=ct.encoding, values=vals)
