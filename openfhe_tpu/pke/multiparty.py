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
    """Smudging/flooding noise for partial decryptions. In
    NOISE_FLOODING_MULTIPARTY mode uses large sigma
    (docs/static_docs/Threshold_FHE.md)."""
    n = cc.ring_dim
    ns = getattr(cc, "noise_scale_int", 1)
    big = cc.params.multiparty_mode == MultipartyMode.NOISE_FLOODING_MULTIPARTY
    sigma = float(1 << FLOODING_SIGMA_BITS) if big else 3.19
    e = sampling.discrete_gaussian(cc.next_rng(), (n,), sigma=sigma)
    if ns != 1:
        e = e * ns
    return ntt_fwd(sampling.to_residues(e, basis), basis)


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
