"""BFV (RNS) scheme specifics.

Reference analog: /root/reference src/pke/lib/scheme/bfvrns/* —
bfvrns-leveledshe.cpp:217-410 (ExpandCRTBasis -> tensor -> ScaleAndRound
with BEHZ/HPS variants), bfvrns-cryptoparameters.cpp (table precompute),
bfvrns-parametergeneration.cpp (noise-driven sizing).

TPU-first multiplication (integer-exact, float-free): a BEHZ-flavored RNS
scale-and-round built from three integer identities, chosen because TPU
lanes have no f64 for HPS's floating-point overflow estimates:

  1. Expand ct from Q to the aux basis R u {m_sk} with *approximate* base
     conversion (value c + uQ, u <= k_Q — absorbed as noise).
  2. Tensor in both bases; per element form v = t*X + Q/2 (+ Q*S on the aux
     side, S = floor(R/2), making the quotient nonnegative);
     y + S = (v - [v]_Q) / Q over R u sk via one more approx conversion
     (the conversion slack u again only shifts y by -u: noise).
  3. Exact aux->Q return via the Shenoy-Kumaresan correction: the m_sk
     residue pins the overflow count alpha = u' of the approx conversion
     exactly (alpha < k_R < m_sk), so y mod Q is integer-exact.

Rotations/relinearization reuse the hybrid keyswitch (ns = 1).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from openfhe_tpu.lattice import rns_tools as rt
from openfhe_tpu.lattice.basis import make_basis
from openfhe_tpu.math import crt
from openfhe_tpu.math import modops as mo
from openfhe_tpu.math import nbtheory
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from openfhe_tpu.pke import parameters as prm
from openfhe_tpu.pke.ciphertext import Ciphertext, Plaintext


def init_context(cc) -> None:
    p = cc.params
    t = p.plaintext_modulus
    if p.ring_dim == 0:
        # smallest standardized N whose max logQP covers the noise-driven
        # chain AT that N (the chain itself grows with log N — the same
        # fixed-point iteration as bfvrns-parametergeneration.cpp:76ff)
        from openfhe_tpu.pke.constants import SecurityLevel
        if p.security_level == SecurityLevel.HEStd_NotSet:
            p.ring_dim = 16384
        else:
            for cand in (1024, 2048, 4096, 8192, 16384, 32768):
                if (t - 1) % (2 * cand):
                    continue
                bpm = math.log2(t) + math.log2(cand) + 14
                lq = 34 + math.log2(t) + p.mult_depth * bpm
                kq = max(2, math.ceil(lq / p.scaling_mod_size))
                est = kq * p.scaling_mod_size
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
    # noise-driven chain sizing (reference: bfvrns-parametergeneration.cpp)
    bits_per_mult = math.log2(t) + math.log2(n) + 14
    log_q = 34 + math.log2(t) + p.mult_depth * bits_per_mult
    from openfhe_tpu.pke.constants import MultipartyMode
    if p.multiparty_mode == MultipartyMode.NOISE_FLOODING_MULTIPARTY:
        # extra-limb flooding headroom: the reference adds two 60-bit
        # towers (~128 bits, Threshold_FHE.md:28-40); on 32-bit words we
        # add the equivalent bit budget as extra towers
        log_q += 128
    k_q = max(2, math.ceil(log_q / p.scaling_mod_size))
    moduli = prm._distinct_prime_chain(
        2 * n, [p.scaling_mod_size] * k_q)
    cc._init_common(moduli)
    cc.L = 0  # BFV is scale-invariant: no levels
    cc.noise_scale_int = 1
    cc.plaintext_modulus = t
    cc.slots = n
    cc.delta = 1.0
    _precompute_mult_tables(cc)


def _aux_size(cc, size_q: int) -> int:
    t = cc.plaintext_modulus
    n = cc.ring_dim
    log_ql = sum(math.log2(q) for q in cc.moduli_q[:size_q])
    log_r = (math.log2(t) + math.log2(n) + log_ql
             + 2 * math.log2(size_q + 2) + 4)
    return math.ceil(log_r / 30)


def _precompute_mult_tables(cc) -> None:
    t = cc.plaintext_modulus
    n = cc.ring_dim
    q_mods = cc.moduli_q
    big_q = 1
    for q in q_mods:
        big_q *= q
    cc.big_q = big_q
    k_q = len(q_mods)
    k_r = _aux_size(cc, k_q)
    aux = prm._distinct_prime_chain(2 * n, [30] * (k_r + 1),
                                    forbidden=tuple(q_mods) + tuple(cc.moduli_p))
    cc.bfv_aux_pool, cc.bfv_m_sk = aux[:k_r], aux[k_r]
    cc._bfv_mt = {}
    mt = _size_tables(cc, k_q)
    # legacy attribute aliases (full-size tables)
    cc.bfv_r_mods = cc.bfv_aux_pool
    cc.basis_rsk = mt["basis_rsk"]
    cc.basis_r = mt["basis_r"]
    cc.basis_sk = mt["basis_sk"]
    cc.basis_qsk = mt["basis_qsk"]
    cc.bfv_big_r = mt["big_r"]
    cc.st_q_to_rsk = mt["st_q_to_rsk"]
    cc.st_r_to_qsk = mt["st_r_to_qsk"]
    # encryption scaling Delta = floor(Q/t)
    delta = big_q // t
    cc.c_delta_q = rt._shoup_pair([delta % q for q in q_mods], q_mods)


def _size_tables(cc, size_q: int) -> dict:
    """Multiplication tables for a (possibly reduced) Q_l basis
    (reference GetParamsQl/GetParamsRl leveled precomputations,
    bfvrns-cryptoparameters.cpp).  Cached per tower count: the
    HPSPOVERQLEVELED technique tensors in the smallest basis the noise
    allows."""
    if size_q in cc._bfv_mt:
        return cc._bfv_mt[size_q]
    t = cc.plaintext_modulus
    n = cc.ring_dim
    q_mods = list(cc.moduli_q[:size_q])
    big_q = 1
    for q in q_mods:
        big_q *= q
    k_r = min(_aux_size(cc, size_q), len(cc.bfv_aux_pool))
    r_mods = list(cc.bfv_aux_pool[:k_r])
    m_sk = cc.bfv_m_sk
    rsk_mods = r_mods + [m_sk]
    basis_q = cc.basis_q.slice(0, size_q)
    basis_rsk = make_basis(rsk_mods, n)
    big_r = 1
    for r in r_mods:
        big_r *= r
    shift_s = big_r >> 1
    half_q = big_q >> 1
    mt = {
        "basis_q": basis_q,
        "basis_rsk": basis_rsk,
        "basis_r": basis_rsk.slice(0, k_r),
        "basis_sk": basis_rsk.slice(k_r, k_r + 1),
        "basis_qsk": basis_q.concat(basis_rsk.slice(k_r, k_r + 1)),
        "big_r": big_r,
        "st_q_to_rsk": rt.make_switch_tables(q_mods, rsk_mods),
        "st_r_to_qsk": rt.make_switch_tables(r_mods, q_mods + [m_sk]),
        "c_t_q": rt._shoup_pair([t % q for q in q_mods], q_mods),
        "c_t_rsk": rt._shoup_pair([t % r for r in rsk_mods], rsk_mods),
        "c_halfq_q": rt._shoup_pair([half_q % q for q in q_mods], q_mods),
        # aux side gets v + Q*S (S makes the quotient nonnegative)
        "c_halfq_plus_qs_rsk": rt._shoup_pair(
            [(half_q + big_q * shift_s) % r for r in rsk_mods], rsk_mods),
        "c_qinv_rsk": rt._shoup_pair(
            [pow(big_q % r, -1, r) for r in rsk_mods], rsk_mods),
        "c_rinv_sk": rt._shoup_pair([pow(big_r % m_sk, -1, m_sk)], [m_sk]),
        "c_r_q": rt._shoup_pair([big_r % q for q in q_mods], q_mods),
        "c_s_q": rt._shoup_pair([shift_s % q for q in q_mods], q_mods),
    }
    if size_q < len(cc.moduli_q):
        # expansion back to the full basis: multiply by QlHat = Q/Ql
        # (reference ExpandCRTBasisQlHat — dropped towers become zero)
        ql_hat = 1
        for q in cc.moduli_q[size_q:]:
            ql_hat *= q
        mt["c_qlhat_q"] = rt._shoup_pair(
            [ql_hat % q for q in q_mods], q_mods)
    cc._bfv_mt[size_q] = mt
    return mt


def make_packed_plaintext(cc, values, level: int = 0,
                          noise_deg: int = 1) -> Plaintext:
    from openfhe_tpu.pke.encoding.packed import encode_packed
    t = cc.plaintext_modulus
    coeffs = encode_packed(values, t, cc.ring_dim)
    centered = np.where(coeffs > t // 2, coeffs - t, coeffs)
    res = crt.to_residues_host(centered, tuple(cc.moduli_q))
    poly = ntt_fwd(jnp.asarray(res), cc.basis_q)
    return Plaintext(poly=poly, fmt=1, level=0, noise_deg=1, scale=1.0,
                     slots=cc.ring_dim, encoding="PACKED",
                     values=np.asarray(values))


def scale_plaintext_for_add(cc, pt_poly: jnp.ndarray) -> jnp.ndarray:
    """Delta * m (encryption-side scaling; reference STANDARD technique)."""
    c, c_sh = cc.c_delta_q
    return mo.mul_mod_shoup(pt_poly, c, c_sh, cc.basis_q.q)


def encrypt_extended(cc, key, plaintext):
    """EncryptionTechnique.EXTENDED (reference bfvrns-pke.cpp:53-150):
    encrypt over the extended basis Qr = Q * r (one auxiliary prime,
    reused from the hybrid-KS P chain so the existing keys cover it),
    scale the message by floor(Qr/t), then divide-and-round the fresh
    ciphertext by r — fresh noise collapses to modulus-switching noise.
    """
    from openfhe_tpu.lattice.dcrt import Poly, EVAL
    from openfhe_tpu.pke.ciphertext import Ciphertext
    from openfhe_tpu.pke.keys import KeyPair, PublicKey
    from openfhe_tpu.pke.schemes import rns_pke

    t = cc.plaintext_modulus
    q_mods = tuple(int(q) for q in cc.moduli_q)
    if not cc.moduli_p:
        raise ValueError("EXTENDED encryption needs the auxiliary P chain")
    r = int(cc.moduli_p[0])
    qr_mods = q_mods + (r,)
    basis_qr = cc.basis_q.concat(cc.basis_p.slice(0, 1))

    # message residues over Qr (re-encode from the stored coefficients)
    from openfhe_tpu.pke.encoding.packed import encode_packed, coef_encode
    if plaintext.encoding == "PACKED":
        coeffs = encode_packed(plaintext.values, t, cc.ring_dim)
    else:
        coeffs = coef_encode(plaintext.values, t, cc.ring_dim)
    centered = np.where(coeffs > t // 2, coeffs - t, coeffs)
    res = crt.to_residues_host(centered, qr_mods)
    m_qr = ntt_fwd(jnp.asarray(res), basis_qr)

    # Delta_r * m with Delta_r = floor(Q*r / t)
    big_q = 1
    for q in q_mods:
        big_q *= q
    delta_r = (big_q * r) // t
    c, c_sh = rt._shoup_pair([delta_r % q for q in qr_mods], qr_mods)
    m_scaled = mo.mul_mod_shoup(m_qr, c, c_sh, basis_qr.q)

    if isinstance(key, KeyPair):
        key = key.public_key
    if isinstance(key, PublicKey):
        c0, c1 = rns_pke.encrypt_zero_pk(cc.next_rng(), key, basis_qr,
                                         cc.params.secret_key_dist)
        tag = key.key_tag
    else:
        c0, c1 = rns_pke.encrypt_zero_sk(cc.next_rng(), key, basis_qr)
        tag = key.key_tag
    c0 = mo.add_mod(c0, m_scaled, basis_qr.q)

    # divide-and-round by r back to Q (reference ScaleAndRoundPOverQ)
    tab = rt.make_drop_scale_tables(qr_mods)
    c0 = rt.drop_last_and_scale(Poly(c0, EVAL), basis_qr, tab).data
    c1 = rt.drop_last_and_scale(Poly(c1, EVAL), basis_qr, tab).data
    return Ciphertext(elements=(c0, c1), level=plaintext.level,
                      noise_deg=plaintext.noise_deg, scale=plaintext.scale,
                      slots=plaintext.slots, key_tag=tag,
                      encoding=plaintext.encoding,
                      scale_int=plaintext.scale_int)


@jax.jit
def _bfv_scale_round(x_q, x_rsk, cc_tables):
    """round(t*X/Q) mod Q from X's residues over Q and R u sk (all COEFF)."""
    (basis_q, basis_rsk, basis_r, basis_sk, basis_qsk, st_q_to_rsk,
     st_r_to_qsk, c_t_q, c_t_rsk, c_halfq_q, c_halfq_plus_qs_rsk,
     c_qinv_rsk, c_rinv_sk, c_r_q, c_s_q) = cc_tables
    k_r = len(basis_r.moduli)
    # v = t*X + Q/2 (+ Q*S on the aux side)
    v_q = mo.add_mod(mo.mul_mod_shoup(x_q, c_t_q[0], c_t_q[1], basis_q.q),
                     c_halfq_q[0] * jnp.uint32(1), basis_q.q)
    v_q = mo.cond_sub(v_q, basis_q.q)
    v_rsk = mo.mul_mod_shoup(x_rsk, c_t_rsk[0], c_t_rsk[1], basis_rsk.q)
    v_rsk = mo.add_mod(v_rsk, jnp.broadcast_to(c_halfq_plus_qs_rsk[0],
                                               v_rsk.shape), basis_rsk.q)
    # y + S = (v - [v]_Q)/Q over R u sk  (approx conversion: slack -> noise)
    conv = rt.switch_crt_basis_approx(v_q, basis_q, basis_rsk, st_q_to_rsk)
    y_rsk = mo.mul_mod_shoup(mo.sub_mod(v_rsk, conv, basis_rsk.q),
                             c_qinv_rsk[0], c_qinv_rsk[1], basis_rsk.q)
    y_r, y_sk = y_rsk[..., :k_r, :], y_rsk[..., k_r:, :]
    # Shenoy-Kumaresan exact return R -> Q
    z = rt.switch_crt_basis_approx(y_r, basis_r, basis_qsk, st_r_to_qsk)
    z_q, z_sk = z[..., :-1, :], z[..., -1:, :]
    alpha = mo.mul_mod_shoup(mo.sub_mod(z_sk, y_sk, basis_sk.q),
                             c_rinv_sk[0], c_rinv_sk[1], basis_sk.q)
    # alpha < k_R: a small integer, same in every tower
    corr = mo.mul_mod_shoup(
        mo.barrett_u32(alpha, basis_q.q, basis_q.m32),
        c_r_q[0], c_r_q[1], basis_q.q)
    y_q = mo.sub_mod(z_q, corr, basis_q.q)
    # remove the S shift
    ones = jnp.ones_like(y_q)
    s_q = mo.mul_mod_shoup(ones, c_s_q[0], c_s_q[1], basis_q.q)
    return mo.sub_mod(y_q, s_q, basis_q.q)


def _mult_tables(cc, size_q: int | None = None):
    mt = _size_tables(cc, size_q or len(cc.moduli_q))
    return (mt["basis_q"], mt["basis_rsk"], mt["basis_r"], mt["basis_sk"],
            mt["basis_qsk"], mt["st_q_to_rsk"], mt["st_r_to_qsk"],
            mt["c_t_q"], mt["c_t_rsk"], mt["c_halfq_q"],
            mt["c_halfq_plus_qs_rsk"], mt["c_qinv_rsk"], mt["c_rinv_sk"],
            mt["c_r_q"], mt["c_s_q"])


@jax.jit
def _bfv_tensor(a_elems, b_elems, cc_tables):
    """Full BFV tensor product: expand to R u sk, multiply, scale-round."""
    (basis_q, basis_rsk) = cc_tables[0], cc_tables[1]
    st_q_to_rsk = cc_tables[5]

    def expand(c):
        c_coeff = ntt_inv(c, basis_q)
        c_aux = rt.switch_crt_basis_approx(c_coeff, basis_q, basis_rsk,
                                           st_q_to_rsk)
        return ntt_fwd(c_aux, basis_rsk)

    a0, a1 = a_elems
    b0, b1 = b_elems
    a0r, a1r, b0r, b1r = expand(a0), expand(a1), expand(b0), expand(b1)
    mmq = lambda x, y: mo.mul_mod(x, y, basis_q.q, basis_q.r32,
                                  basis_q.r32_sh, basis_q.m32)
    mmr = lambda x, y: mo.mul_mod(x, y, basis_rsk.q, basis_rsk.r32,
                                  basis_rsk.r32_sh, basis_rsk.m32)
    prods_q = (mmq(a0, b0), mo.add_mod(mmq(a0, b1), mmq(a1, b0), basis_q.q),
               mmq(a1, b1))
    prods_r = (mmr(a0r, b0r),
               mo.add_mod(mmr(a0r, b1r), mmr(a1r, b0r), basis_rsk.q),
               mmr(a1r, b1r))
    out = []
    for xq, xr in zip(prods_q, prods_r):
        y = _bfv_scale_round(ntt_inv(xq, basis_q), ntt_inv(xr, basis_rsk),
                             cc_tables)
        out.append(ntt_fwd(y, basis_q))
    return tuple(out)


def _find_levels_to_drop(cc, mult_depth_done: int,
                         key_switch: bool = False) -> int:
    """(reference FindLevelsToDrop, bfvrns-leveledshe.cpp:96) noise-driven
    tower-drop count for HPSPOVERQLEVELED; HYBRID keyswitch model."""
    p_t = float(cc.plaintext_modulus)
    n = cc.ring_dim
    dcrt_bits = cc.moduli_q[0].bit_length()
    sigma = 3.19
    alpha_assurance = 36.0
    b_err = sigma * math.sqrt(alpha_assurance)
    b_key = 1.0                                   # ternary secret
    num_part_q = cc.params.num_large_digits
    k_per_part = math.ceil(len(cc.moduli_q) / num_part_q)

    delta = 2.0 * math.sqrt(n)
    delta_ms = 4.0 * math.sqrt(n)
    v_norm = b_err * (1.0 + 2.0 * delta * b_key)

    def noise_ks():
        return k_per_part * (num_part_q * delta * b_err
                             + delta_ms * b_key + 1.0)

    c1 = delta * delta_ms * p_t * b_key
    c2 = delta * delta_ms * b_key * b_key / 2.0 + noise_ks()

    def logq_bfv():
        if mult_depth_done > 0:
            return (math.log2(4 * p_t)
                    + (mult_depth_done - 1) * math.log2(c1)
                    + math.log2(c1 * v_norm + mult_depth_done * c2))
        return math.log2(p_t * 4.0 * v_norm)

    logq = logq_bfv()
    loge = logq - 2 - math.log2(p_t)
    log_extra = math.log2(noise_ks()) if key_switch else math.log2(delta_ms)
    levels = math.floor(
        (loge - 3 * mult_depth_done - 16 - log_extra) / dcrt_bits)
    return max(0, min(levels, len(cc.moduli_q) - 1))


def _scale_to_ql(cc, poly_eval: jnp.ndarray, size_l: int) -> jnp.ndarray:
    """round(Ql/Q * c): iterated exact tower drops (reference ScaleAndRound
    to GetParamsQl; we divide one prime at a time with the shared CKKS
    rescale kernel — integer-exact per step)."""
    from openfhe_tpu.lattice.dcrt import EVAL, Poly
    size = poly_eval.shape[-2]
    out = poly_eval
    while size > size_l:
        basis = cc.basis_q.slice(0, size)
        tab = cc.rescale_tables(size)
        out = rt.drop_last_and_scale(Poly(out, EVAL), basis, tab).data
        size -= 1
    return out


def _expand_ql_to_q(cc, poly_eval: jnp.ndarray, size_l: int) -> jnp.ndarray:
    """c -> c * QlHat over the full basis (reference ExpandCRTBasisQlHat):
    kept towers scale by QlHat mod q_i, dropped towers are zero."""
    mt = _size_tables(cc, size_l)
    c, c_sh = mt["c_qlhat_q"]
    basis_ql = cc.basis_q.slice(0, size_l)
    scaled = mo.mul_mod_shoup(poly_eval, c, c_sh, basis_ql.q)
    pad = [(0, 0)] * (scaled.ndim - 2) + \
        [(0, len(cc.moduli_q) - size_l), (0, 0)]
    return jnp.pad(scaled, pad)


def eval_mult_no_relin(cc, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """Technique dispatch (reference EvalMultCore, bfvrns-leveledshe.cpp:199).

    BEHZ/HPS/HPSPOVERQ share our one integer-exact TPU path (module
    docstring); HPSPOVERQLEVELED additionally drops towers the accumulated
    noise has already consumed before tensoring — the tensor and base
    conversions then run on the smaller basis (the reference's main BFV
    speedup) — and expands the result back to Q afterwards."""
    from openfhe_tpu.pke.constants import MultiplicationTechnique as MT
    tech = cc.params.multiplication_technique
    k_q = len(cc.moduli_q)
    size_l = k_q
    a_el, b_el = a.elements[:2], b.elements[:2]
    if tech == MT.HPSPOVERQLEVELED:
        done = max(a.noise_deg, b.noise_deg) - 1
        drop = _find_levels_to_drop(cc, done)
        size_l = max(2, k_q - drop)
        if size_l < k_q:
            a_el = tuple(_scale_to_ql(cc, e, size_l) for e in a_el)
            b_el = tuple(_scale_to_ql(cc, e, size_l) for e in b_el)
    elems = _bfv_tensor(a_el, b_el, _mult_tables(cc, size_l))
    if size_l < k_q:
        elems = tuple(_expand_ql_to_q(cc, e, size_l) for e in elems)
    return a.replace(elements=elems,
                     noise_deg=max(a.noise_deg, b.noise_deg) + 1)


def decrypt_tail(cc, coeff_residues, ct: Ciphertext) -> Plaintext:
    """m = round(t * [c(s)]_Q / Q) mod t, exact on host."""
    t = cc.plaintext_modulus
    centered = crt.interpolate_centered(np.asarray(coeff_residues),
                                        tuple(cc.moduli_q))
    big_q = cc.big_q
    m = [(int(v) * t + (big_q >> 1)) // big_q % t for v in centered]
    from openfhe_tpu.pke.encoding.packed import decode_packed
    vals = decode_packed(np.array(m, np.int64), t, cc.ring_dim)
    return Plaintext(poly=coeff_residues, fmt=0, level=0, slots=ct.slots,
                     encoding=ct.encoding, values=vals)
