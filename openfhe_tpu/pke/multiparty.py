"""Threshold / multiparty FHE (n-of-n additive, t-of-n sharing).

Reference analog: /root/reference src/pke/include/schemebase/base-multiparty.h
(:105-282: round-robin MultipartyKeyGen, joint eval-key protocol
MultiKeySwitchGen / MultiAddEvalKeys / MultiMultEvalKey /
MultiEvalAutomorphismKeyGen / MultiEvalSumKeyGen, distributed decryption
Lead/Main/Fusion) and rns-multiparty.cpp; protocol docs at
docs/static_docs/Threshold_FHE.md. As in the reference's tests, parties run
sequentially in one process and exchange objects directly (SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openfhe_tpu.math import modops as mo
from openfhe_tpu.math import sampling
from openfhe_tpu.ops.ntt import ntt_fwd
from openfhe_tpu.pke.ciphertext import Ciphertext
from openfhe_tpu.pke.keys import EvalKey, KeyPair, PrivateKey, PublicKey
from openfhe_tpu.pke.constants import MultipartyMode

FLOODING_SIGMA_BITS = 17   # smudging noise for partial decryptions


def _fresh_secret(cc) -> PrivateKey:
    n = cc.ring_dim
    cc._key_counter += 1
    k1 = cc.next_rng()
    s_small = sampling.ternary(k1, (n,))
    s_qp = ntt_fwd(sampling.to_residues(s_small, cc.basis_qp), cc.basis_qp)
    return PrivateKey(s_qp=s_qp, key_tag=f"mp-key-{cc._key_counter}")


def multiparty_key_gen(cc, prev_pk: PublicKey | None = None) -> KeyPair:
    """Round-robin joint keygen (base-multiparty.h:105): each party adds
    its share to the running public key, keeping the common `a`."""
    b = cc.basis_qp
    n = cc.ring_dim
    ns = getattr(cc, "noise_scale_int", 1)
    sk = _fresh_secret(cc)
    if prev_pk is None:
        kp = cc.KeyGen()
        return KeyPair(public_key=kp.public_key, secret_key=kp.secret_key)
    a = prev_pk.a
    e = ntt_fwd(sampling.to_residues(
        sampling.discrete_gaussian(cc.next_rng(), (n,)), b), b)
    if ns != 1:
        from openfhe_tpu.lattice import rns_tools as rt
        c, c_sh = rt._shoup_pair([ns % q for q in b.moduli], b.moduli)
        e = mo.mul_mod_shoup(e, c, c_sh, b.q)
    mm = lambda x, y: mo.mul_mod(x, y, b.q, b.r32, b.r32_sh, b.m32)
    share = mo.sub_mod(e, mm(a, sk.s_qp), b.q)
    b_new = mo.add_mod(prev_pk.b, share, b.q)
    tag = prev_pk.key_tag + "+" + sk.key_tag
    return KeyPair(public_key=PublicKey(b=b_new, a=a, key_tag=tag),
                   secret_key=sk.replace(key_tag=tag))


def multiparty_decrypt_lead(cc, ct: Ciphertext, sk: PrivateKey):
    """Lead partial decryption: c0 + c1*s_1 + e_smudge
    (base-multiparty.h:189)."""
    basis = cc.basis_at(ct.level)
    k = ct.num_towers
    mm = lambda x, y: mo.mul_mod(x, y, basis.q, basis.r32, basis.r32_sh,
                                 basis.m32)
    part = mo.add_mod(ct.elements[0], mm(ct.elements[1], sk.s_qp[:k]),
                      basis.q)
    part = mo.add_mod(part, _smudge(cc, basis), basis.q)
    return ct.replace(elements=(part,))


def multiparty_decrypt_main(cc, ct: Ciphertext, sk: PrivateKey):
    """Non-lead partial decryption: c1*s_i + e_smudge."""
    basis = cc.basis_at(ct.level)
    k = ct.num_towers
    mm = lambda x, y: mo.mul_mod(x, y, basis.q, basis.r32, basis.r32_sh,
                                 basis.m32)
    part = mo.add_mod(mm(ct.elements[1], sk.s_qp[:k]), _smudge(cc, basis),
                      basis.q)
    return ct.replace(elements=(part,))


def _smudge(cc, basis):
    """Smudging/flooding noise for partial decryptions
    (docs/static_docs/Threshold_FHE.md:28-40).

    NOISE_FLOODING_MULTIPARTY + BFV/BGV: the reference's extra-limb
    mechanism — parameter generation added ~128 bits of modulus headroom
    (see schemes/{bfv,bgv}.init_context), and the flooding mask is a
    UNIFORM ring element b over Q' = Q/q_0, basis-extended exactly to the
    full Q (x t for BGV so the mask vanishes mod t). |b| < Q/q_0 stays
    below the correctness bound Delta/2 while statistically drowning the
    share's noise. Other modes: fixed ~2^17-sigma Gaussian smudge
    (FIXED_NOISE, ~20-bit like the reference's fixed mode) or fresh-noise
    sigma for CKKS/INDCPA.
    """
    from openfhe_tpu.pke.constants import Scheme
    n = cc.ring_dim
    ns = getattr(cc, "noise_scale_int", 1)
    big = cc.params.multiparty_mode == MultipartyMode.NOISE_FLOODING_MULTIPARTY
    if big and cc.scheme in (Scheme.BFVRNS_SCHEME, Scheme.BGVRNS_SCHEME):
        from openfhe_tpu.lattice import rns_tools as rt
        k = len(basis.moduli)
        if k < 2:
            raise ValueError("extra-limb flooding needs >= 2 towers")
        sub = basis.slice(1, k)                    # Q' = Q / q_0
        b = sampling.uniform_residues(cc.next_rng(), sub)   # EVAL-uniform
        # exact extension Q' -> Q happens in COEFF
        from openfhe_tpu.ops.ntt import ntt_inv
        b_coeff = ntt_inv(b, sub)
        key = ("flood_ext", tuple(sub.moduli), tuple(basis.moduli))
        cache = getattr(cc, "_flood_cache", None)
        if cache is None:
            cache = cc._flood_cache = {}
        if key not in cache:
            cache[key] = rt.make_switch_tables(sub.moduli, basis.moduli)
        ext = rt.switch_crt_basis_exact(b_coeff, sub, basis, cache[key])
        if ns != 1:                                # BGV: mask = t * b
            c, c_sh = rt._shoup_pair([ns % q for q in basis.moduli],
                                     basis.moduli)
            ext = mo.mul_mod_shoup(ext, c, c_sh, basis.q)
        return ntt_fwd(ext, basis)
    sigma = float(1 << FLOODING_SIGMA_BITS) if big else 3.19
    e = sampling.discrete_gaussian(cc.next_rng(), (n,), sigma=sigma)
    er = sampling.to_residues(e, basis)
    if ns != 1:
        # multiply by t modularly AFTER residue lifting (t * e overflows
        # int32 for large smudging sigma)
        from openfhe_tpu.lattice import rns_tools as rt
        c, c_sh = rt._shoup_pair([ns % q for q in basis.moduli],
                                 basis.moduli)
        er = mo.mul_mod_shoup(er, c, c_sh, basis.q)
    return ntt_fwd(er, basis)


def multiparty_decrypt_fusion(cc, partials, ct_meta: Ciphertext):
    """Combine partial decryptions and decode
    (reference: MultipartyDecryptFusion, cryptocontext.h:3151)."""
    import numpy as np
    basis = cc.basis_at(ct_meta.level)
    acc = partials[0].elements[0]
    for p in partials[1:]:
        acc = mo.add_mod(acc, p.elements[0], basis.q)
    from openfhe_tpu.ops.ntt import ntt_inv
    coeff = ntt_inv(acc, basis)
    from openfhe_tpu.pke.constants import Scheme
    if cc.scheme == Scheme.CKKSRNS_SCHEME:
        vals = cc.decode_ckks(np.asarray(coeff), ct_meta.level,
                              ct_meta.scale, ct_meta.slots)
        from openfhe_tpu.pke.ciphertext import Plaintext
        return Plaintext(poly=coeff, fmt=0, level=ct_meta.level,
                         scale=ct_meta.scale, slots=ct_meta.slots,
                         values=vals)
    from openfhe_tpu.pke.schemes import bfv, bgv
    if cc.scheme == Scheme.BGVRNS_SCHEME:
        return bgv.decrypt_tail(cc, coeff, ct_meta)
    return bfv.decrypt_tail(cc, coeff, ct_meta)


# ---------------------------------------------------------------------------
# joint evaluation-key protocol (base-multiparty.h:135-282)
# ---------------------------------------------------------------------------

def multi_key_switch_gen(cc, original_sk: PrivateKey, new_sk: PrivateKey,
                         ek_prev: EvalKey) -> EvalKey:
    """KS-key share reusing the common `a` vector of ek_prev (reference:
    MultiKeySwitchGen with ekPrev)."""
    from openfhe_tpu.lattice import rns_tools as rt
    b = cc.basis_qp
    n = cc.ring_dim
    ns = getattr(cc, "noise_scale_int", 1)
    k_q = len(cc.moduli_q)
    num_parts = ek_prev.av.shape[0]
    alpha = -(-k_q // num_parts)
    mm = lambda x, y: mo.mul_mod(x, y, b.q, b.r32, b.r32_sh, b.m32)
    k_qp = len(b.moduli)
    bs = []
    for part in range(num_parts):
        e = ntt_fwd(sampling.to_residues(
            sampling.discrete_gaussian(cc.next_rng(), (n,)), b), b)
        if ns != 1:
            c, c_sh = rt._shoup_pair([ns % q for q in b.moduli], b.moduli)
            e = mo.mul_mod_shoup(e, c, c_sh, b.q)
        bb = mo.sub_mod(e, mm(ek_prev.av[part], new_sk.s_qp), b.q)
        start, end = alpha * part, min(alpha * (part + 1), k_q)
        ps_old = mo.mul_mod_shoup(original_sk.s_qp, cc.p_modq, cc.p_modq_sh,
                                  b.q)
        row_ids = jnp.arange(k_qp)[:, None]
        mask = (row_ids >= start) & (row_ids < end)
        bb = jnp.where(mask, mo.add_mod(bb, ps_old, b.q), bb)
        bs.append(bb)
    return EvalKey(bv=jnp.stack(bs), av=ek_prev.av, key_tag=new_sk.key_tag)


def multi_add_evalkeys(cc, ek1: EvalKey, ek2: EvalKey,
                       key_tag: str = "") -> EvalKey:
    """bv summed, common av (reference: MultiAddEvalKeys)."""
    b = cc.basis_qp
    return EvalKey(bv=mo.add_mod(ek1.bv, ek2.bv, b.q), av=ek1.av,
                   key_tag=key_tag or ek1.key_tag)


def multi_mult_eval_key(cc, ek: EvalKey, sk: PrivateKey,
                        key_tag: str = "") -> EvalKey:
    """Multiply both halves by the party's secret share
    (reference: MultiMultEvalKey)."""
    b = cc.basis_qp
    n = cc.ring_dim
    ns = getattr(cc, "noise_scale_int", 1)
    mm = lambda x, y: mo.mul_mod(x, y, b.q, b.r32, b.r32_sh, b.m32)

    def noisy(x):
        e = ntt_fwd(sampling.to_residues(
            sampling.discrete_gaussian(cc.next_rng(), (n,)), b), b)
        if ns != 1:
            from openfhe_tpu.lattice import rns_tools as rt
            c, c_sh = rt._shoup_pair([ns % q for q in b.moduli], b.moduli)
            e = mo.mul_mod_shoup(e, c, c_sh, b.q)
        return mo.add_mod(x, e, b.q)

    bv = jnp.stack([noisy(mm(ek.bv[j], sk.s_qp))
                    for j in range(ek.bv.shape[0])])
    av = jnp.stack([noisy(mm(ek.av[j], sk.s_qp))
                    for j in range(ek.av.shape[0])])
    return EvalKey(bv=bv, av=av, key_tag=key_tag or ek.key_tag)


def multi_add_evalmult_keys(cc, ek1: EvalKey, ek2: EvalKey,
                            key_tag: str = "") -> EvalKey:
    """Final joint relin key: both halves summed
    (reference: MultiAddEvalMultKeys)."""
    b = cc.basis_qp
    return EvalKey(bv=mo.add_mod(ek1.bv, ek2.bv, b.q),
                   av=mo.add_mod(ek1.av, ek2.av, b.q),
                   key_tag=key_tag or ek1.key_tag)


def multi_eval_automorphism_keygen(cc, sk: PrivateKey, ek_prev_map: dict,
                                   g_list, key_tag: str = "") -> dict:
    """Joint rotation keys (reference: MultiEvalAutomorphismKeyGen)."""
    from openfhe_tpu.lattice.automorph import eval_indices
    out = {}
    for g in g_list:
        idx = jnp.asarray(eval_indices(cc.ring_dim, g))
        s_g = PrivateKey(s_qp=jnp.take(sk.s_qp, idx, axis=-1),
                         key_tag=sk.key_tag)
        out[g] = multi_key_switch_gen(cc, s_g, sk, ek_prev_map[g])
    return out


def multi_add_automorphism_keys(cc, map1: dict, map2: dict,
                                key_tag: str = "") -> dict:
    return {g: multi_add_evalkeys(cc, map1[g], map2[g], key_tag)
            for g in map1}


# ---------------------------------------------------------------------------
# t-of-n secret sharing (reference: ShareKeys / RecoverSharedKey,
# cryptocontext.cpp — Shamir over each RNS modulus)
# ---------------------------------------------------------------------------

def share_keys(cc, sk: PrivateKey, num_parties: int, threshold: int,
               seed: int = 0) -> dict:
    """Shamir-share the secret key per RNS tower. Returns {party: share}."""
    import numpy as np
    s = np.asarray(sk.s_qp)  # [kqp, N] EVAL residues
    k, n = s.shape
    rng = np.random.default_rng(seed)
    mods = np.array(cc.basis_qp.moduli, np.uint64)[:, None]
    coeffs = [s.astype(np.uint64)]
    for _ in range(threshold - 1):
        coeffs.append(
            (rng.integers(0, 1 << 62, size=(k, n)).astype(np.uint64) % mods))
    shares = {}
    # Horner evaluation, exact per modulus (values < 2^31, party < 2^31)
    for party in range(1, num_parties + 1):
        acc = np.zeros((k, n), np.uint64)
        for c in reversed(coeffs):
            acc = (acc * np.uint64(party) + c) % mods
        shares[party] = jnp.asarray(acc.astype(np.uint32))
    return shares


def recover_shared_key(cc, shares: dict, key_tag: str = "") -> PrivateKey:
    """Lagrange interpolation at 0 per RNS tower."""
    import numpy as np
    parties = sorted(shares)
    mods = [int(m) for m in cc.basis_qp.moduli]
    k = len(mods)
    acc = None
    for i in parties:
        lam = []
        for q in mods:
            num, den = 1, 1
            for j in parties:
                if j == i:
                    continue
                num = num * (-j) % q
                den = den * (i - j) % q
            lam.append(num * pow(den, -1, q) % q)
        from openfhe_tpu.lattice import rns_tools as rt
        c, c_sh = rt._shoup_pair(lam, mods)
        term = mo.mul_mod_shoup(shares[i], c, c_sh, cc.basis_qp.q)
        acc = term if acc is None else mo.add_mod(acc, term, cc.basis_qp.q)
    return PrivateKey(s_qp=acc, key_tag=key_tag or "recovered")


# ---------------------------------------------------------------------------
# Interactive (2-round) bootstrapping — single-key 2-party and multiparty
# (reference: rns-multiparty.cpp IntBootDecrypt :374 / IntBootEncrypt :406 /
# IntBootAdd :484 / PolynomialRound / ExtendBasis;
# ckksrns-multiparty.cpp IntBootAdjustScale :451, IntMPBoot* :116-448)
# ---------------------------------------------------------------------------

def _extend_centered(cc, poly_eval, from_size: int, to_size: int):
    """Centered exact CRT-basis extension (reference ExtendBasis /
    ExpandCRTBasis): host big-int at the protocol boundary."""
    import numpy as np
    from openfhe_tpu.math import crt
    from openfhe_tpu.ops.ntt import ntt_inv
    b_from = cc.basis_q.slice(0, from_size)
    b_to = cc.basis_q.slice(0, to_size)
    coeff = np.asarray(ntt_inv(poly_eval, b_from))
    centered = crt.interpolate_centered(coeff, b_from.moduli)
    res = crt.to_residues_host(centered, tuple(b_to.moduli))
    return ntt_fwd(jnp.asarray(res), b_to)


def _polynomial_round(cc, cs_eval, size: int):
    """(reference PolynomialRound): over a 2-tower chain, add Q/2 to
    coefficients whose centered CRT value lies in (Q/4, 3Q/4]."""
    import numpy as np
    from openfhe_tpu.math import crt
    from openfhe_tpu.ops.ntt import ntt_inv
    basis = cc.basis_q.slice(0, size)
    coeff = np.asarray(ntt_inv(cs_eval, basis))
    vals, big = crt.interpolate(coeff, basis.moduli)
    q1, q3, half = big // 4, 3 * big // 4, big // 2
    shifted = np.array([(int(v) + half) % big
                        if q1 < int(v) <= q3 else int(v)
                        for v in vals], object)
    res = crt.to_residues_host(shifted, tuple(basis.moduli))
    return ntt_fwd(jnp.asarray(res), basis)


def int_boot_adjust_scale(cc, ct: Ciphertext) -> Ciphertext:
    """Compress to 2 towers on a canonical scale (IntBootAdjustScale)."""
    k = len(cc.moduli_q)
    if cc._flexible():
        ct = cc.Compress(ct, 3)
        l_t = k - 2
        ql = cc.moduli_q[2]
        ct = cc._scalar_mult_raw(ct, 1.0,
                                 cc.scf_real[l_t] * float(ql) / ct.scale)
        return cc.ModReduce(ct)
    return cc.Compress(ct, 2)


def int_boot_decrypt(cc, sk: PrivateKey, ct: Ciphertext) -> Ciphertext:
    """Partial decryption share cs = c0 + c1*s (or c0*s for a c1-only
    input), rounded (IntBootDecrypt)."""
    size = ct.num_towers
    basis = cc.basis_q.slice(0, size)
    s = sk.s_qp[:size]
    mm = lambda x, y: mo.mul_mod(x, y, basis.q, basis.r32, basis.r32_sh,
                                 basis.m32)
    if len(ct.elements) == 1:
        cs = mm(ct.elements[0], s)
    else:
        cs = mo.add_mod(mm(ct.elements[1], s), ct.elements[0], basis.q)
    cs = _polynomial_round(cc, cs, size)
    return ct.replace(elements=(cs,))


def int_boot_encrypt(cc, pk: PublicKey, ct_share: Ciphertext) -> Ciphertext:
    """Re-encrypt a (rounded) share under the joint public key at the full
    modulus (IntBootEncrypt)."""
    from openfhe_tpu.pke.schemes import rns_pke
    k = len(cc.moduli_q)
    ptxt = _extend_centered(cc, ct_share.elements[0], ct_share.num_towers, k)
    c0, c1 = rns_pke.encrypt_zero_pk(cc.next_rng(), pk, cc.basis_q,
                                     cc.params.secret_key_dist)
    c0 = mo.add_mod(c0, ptxt, cc.basis_q.q)
    return ct_share.replace(elements=(c0, c1), level=0)


def int_boot_add(cc, ct1: Ciphertext, ct2_share: Ciphertext) -> Ciphertext:
    """Add the other party's extended share into c0 (IntBootAdd)."""
    k = ct1.num_towers
    ext = _extend_centered(cc, ct2_share.elements[0],
                           ct2_share.num_towers, k)
    basis = cc.basis_q.slice(0, k)
    c0 = mo.add_mod(ct1.elements[0], ext, basis.q)
    return ct1.replace(elements=(c0,) + ct1.elements[1:])


# --- multiparty variants (ckksrns-multiparty.cpp :116-448) ---

def _compression_towers(cc) -> int:
    lvl = cc.params.interactive_boot_compression_level
    cl = 1 if str(lvl).upper() == "COMPACT" else 2
    return cl


def int_mp_boot_adjust_scale(cc, ct: Ciphertext) -> Ciphertext:
    """Compress to (message + compression) towers (IntMPBootAdjustScale)."""
    cl = _compression_towers(cc)
    sf_bits = cc.params.scaling_mod_size
    first_bits = cc.moduli_q[0].bit_length()
    keep = (sf_bits // first_bits + 1) + cl
    k = len(cc.moduli_q)
    if cc._flexible():
        ct = cc.Compress(ct, keep + 1)
        l_t = k - keep
        ql = cc.moduli_q[keep]
        ct = cc._scalar_mult_raw(ct, 1.0,
                                 cc.scf_real[l_t] * float(ql) / ct.scale)
        return cc.ModReduce(ct)
    return cc.Compress(ct, keep)


def int_mp_boot_random_element_gen(cc, pk: PublicKey) -> Ciphertext:
    """Common random polynomial over the full chain
    (IntMPBootRandomElementGen)."""
    crp = sampling.uniform_residues(cc.next_rng(), cc.basis_q)
    return Ciphertext(elements=(crp,), level=0, key_tag=pk.key_tag)


def int_mp_boot_decrypt(cc, sk: PrivateKey, ct: Ciphertext,
                        a: Ciphertext) -> list:
    """Party share pair (h0_i, h1_i) (IntMPBootDecrypt):
    h0_i = s_i*c1 + e - M_i over the compressed chain;
    h1_i = -s_i*a + e' + M_i over the full chain."""
    import numpy as np
    from openfhe_tpu.math import crt
    cl = _compression_towers(cc)
    c1 = ct.elements[1] if len(ct.elements) >= 2 else ct.elements[0]
    size = c1.shape[-2]
    k = len(cc.moduli_q)
    basis_c = cc.basis_q.slice(0, size)

    # mask over the first `cl` towers, shared (centered) across both domains
    mask_basis = cc.basis_q.slice(0, cl)
    mi_res = sampling.uniform_residues(cc.next_rng(), mask_basis)
    from openfhe_tpu.ops.ntt import ntt_inv
    mi_coeff = np.asarray(ntt_inv(mi_res, mask_basis))
    mi_centered = crt.interpolate_centered(mi_coeff, mask_basis.moduli)
    mi_c = ntt_fwd(jnp.asarray(crt.to_residues_host(
        mi_centered, tuple(basis_c.moduli))), basis_c)
    mi_q = ntt_fwd(jnp.asarray(crt.to_residues_host(
        mi_centered, tuple(cc.basis_q.moduli))), cc.basis_q)

    mm_c = lambda x, y: mo.mul_mod(x, y, basis_c.q, basis_c.r32,
                                   basis_c.r32_sh, basis_c.m32)
    mm_q = lambda x, y: mo.mul_mod(x, y, cc.basis_q.q, cc.basis_q.r32,
                                   cc.basis_q.r32_sh, cc.basis_q.m32)
    n = cc.ring_dim
    e0 = ntt_fwd(sampling.to_residues(sampling.discrete_gaussian(
        cc.next_rng(), (n,)), basis_c), basis_c)
    e1 = ntt_fwd(sampling.to_residues(sampling.discrete_gaussian(
        cc.next_rng(), (n,)), cc.basis_q), cc.basis_q)

    h0 = mo.sub_mod(mo.add_mod(mm_c(c1, sk.s_qp[:size]), e0, basis_c.q),
                    mi_c, basis_c.q)
    h1 = mo.add_mod(mo.sub_mod(e1, mm_q(a.elements[0], sk.s_qp[:k]),
                               cc.basis_q.q), mi_q, cc.basis_q.q)
    return [ct.replace(elements=(h0,)),
            ct.replace(elements=(h1,), level=0)]


def int_mp_boot_add(cc, shares_vec: list) -> list:
    """Aggregate share pairs (IntMPBootAdd)."""
    h0, h1 = shares_vec[0]
    size0 = h0.num_towers
    basis_c = cc.basis_q.slice(0, size0)
    e0, e1 = h0.elements[0], h1.elements[0]
    for p0, p1 in shares_vec[1:]:
        e0 = mo.add_mod(e0, p0.elements[0], basis_c.q)
        e1 = mo.add_mod(e1, p1.elements[0], cc.basis_q.q)
    return [h0.replace(elements=(e0,)), h1.replace(elements=(e1,))]


def int_mp_boot_encrypt(cc, pk: PublicKey, shares: list, a: Ciphertext,
                        ct: Ciphertext) -> Ciphertext:
    """Assemble the refreshed full-modulus ciphertext (IntMPBootEncrypt)."""
    h0, h1 = shares
    size = ct.num_towers
    k = len(cc.moduli_q)
    basis_c = cc.basis_q.slice(0, size)
    c0p = mo.add_mod(ct.elements[0], h0.elements[0], basis_c.q)
    c0p_full = _extend_centered(cc, c0p, size, k)
    c0pp = mo.add_mod(c0p_full, h1.elements[0], cc.basis_q.q)
    return ct.replace(elements=(c0pp, a.elements[0]), level=0,
                      key_tag=pk.key_tag)
