"""CKKS <-> FHEW scheme switching.

Reference analog: /root/reference
src/pke/lib/scheme/ckksrns/ckksrns-schemeswitching.cpp (1705 LoC):
EvalCKKStoFHEWSetup :728 / KeyGen :789 / Precompute :838 / EvalCKKStoFHEW
:887, switchingKeyGenRLWEcc :? (RLWE-embedded LWE key switch key),
ExtractLWEpacked :306, ExtractLWECiphertext :317, EvalFHEWtoCKKS :1035,
EvalSchemeSwitchingSetup :1180, EvalCompareSchemeSwitching :1359.

TPU-first redesign:
  * LWE outputs are our batched tensor ciphertexts; extraction is a
    vectorized negacyclic gather over all sample indices at once.
  * The homomorphic partial decryption A*s rides the same BSGS linear
    transform used by bootstrapping, with the rectangular [numValues, n]
    matrix laid out as wraparound diagonals against the replicated secret.
  * The FHEW-phase mod reduction reuses the bootstrap's adaptive
    double-angle Chebyshev seed (the reference's g_coefficientsFHEW tables
    interpolate the same function; we generate them at setup).
  * Exact-integer modulus switches run on host int64 at the (tiny) scheme
    boundary.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from openfhe_tpu.binfhe import lwe as lwe_mod
from openfhe_tpu.binfhe.context import BinFHEContext
from openfhe_tpu.math import modops as mo
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from openfhe_tpu.pke.ciphertext import Ciphertext
from openfhe_tpu.pke.fhe.ckks_bootstrap import (_mod_func_coefficients,
                                                eval_linear_transform)
from openfhe_tpu.pke.keys import PrivateKey


@dataclass
class SchSwchParams:
    """(reference SchSwchParams, scheme-switching setup knobs)"""
    security_level_fhew: str = "TOY"          # TOY or STD128
    num_slots_ckks: int = 0
    num_values: int = 0
    ctxt_mod_size_fhew_large_prec: int = 25   # log q_LWE (large precision)
    ctxt_mod_size_fhew_intermed_swch: int = 27  # log Q' (intermediate)
    arbitrary_function_evaluation: bool = False
    bstep_lt: int = 0


@dataclass
class SchemeSwitchState:
    params: SchSwchParams
    cc_lwe: BinFHEContext = None
    lwe_sk: object = None
    n_lwe: int = 0
    q_prime: int = 0                 # intermediate modulus Q'
    modulus_lwe: int = 0             # q_LWE
    basis_int: object = None         # 1-tower basis at Q' (ring dim N)
    swk: object = None               # CKKS->RLWE(LWE key) switch key
    swk_tabs: object = None
    s2c_diags: list = field(default_factory=list)
    s2c_bstep: int = 0
    s2c_pt_slots: int = 0
    slots: int = 0
    # FHEW -> CKKS
    fhew_to_ckks_swk: object = None  # CKKS encryption of the LWE secret
    k_bound: float = 128.0
    cheb_fhew: list = field(default_factory=list)


def _decode_matrices(slots: int):
    m = 4 * slots
    omega = np.exp(2j * np.pi / m)
    rot_group = np.array([pow(5, i, m) for i in range(slots)])
    u0 = omega ** (np.outer(rot_group, np.arange(slots)) % m)
    return u0, 1j * u0


def eval_ckks_to_fhew_setup(cc, params: SchSwchParams):
    """(reference EvalCKKStoFHEWSetup :728) Build the FHEW context and the
    intermediate 1-tower modulus; returns the LWE secret key."""
    from openfhe_tpu.lattice.basis import make_basis
    from openfhe_tpu.math import nbtheory

    st = SchemeSwitchState(params=params)
    st.slots = params.num_slots_ckks or cc.ring_dim // 2

    st.cc_lwe = BinFHEContext(seed=101)
    if params.security_level_fhew == "TOY":
        n_fhew, ring_fhew = 32, 1024
    else:
        n_fhew, ring_fhew = 1305, 2048
    q_fhew = ring_fhew if params.arbitrary_function_evaluation \
        else 2 * ring_fhew
    # baseG=128 gives 4 gadget digits at 27-bit Q (the reference pairs
    # baseG=2^18 with a 54-bit Q'; our 32-bit lanes cap Q at 27 bits, so a
    # smaller base keeps the approximate-decomposition noise in budget)
    st.cc_lwe.GenerateBinFHEContextCustom(
        n=n_fhew, N=ring_fhew, q=q_fhew, q_bits=27, base_ks=32,
        base_g=128)
    # the large-precision modulus of the switched LWE ciphertexts
    st.modulus_lwe = (1 << params.ctxt_mod_size_fhew_large_prec) \
        if not params.arbitrary_function_evaluation else st.cc_lwe.q
    st.n_lwe = st.cc_lwe.n

    # intermediate modulus Q' (same ring dim as the CKKS context)
    st.q_prime = nbtheory.previous_prime(
        1 << params.ctxt_mod_size_fhew_intermed_swch, 2 * cc.ring_dim)
    if st.q_prime in cc.moduli_q:
        st.q_prime = nbtheory.previous_prime(st.q_prime, 2 * cc.ring_dim)
    st.basis_int = make_basis([st.q_prime], cc.ring_dim)

    st.lwe_sk = st.cc_lwe.KeyGen()
    cc._schswch = st
    return st.lwe_sk


def _secret_coeff_signed(cc, sk: PrivateKey) -> np.ndarray:
    """Recover the small signed secret from its tower-0 EVAL residues."""
    b0 = cc.basis_q.slice(0, 1)
    s0 = np.asarray(ntt_inv(sk.s_qp[:1], b0))[0]
    q0 = cc.moduli_q[0]
    return np.where(s0 > q0 // 2, s0.astype(np.int64) - q0,
                    s0.astype(np.int64))


def eval_ckks_to_fhew_keygen(cc, keys, lwe_sk):
    """(reference EvalCKKStoFHEWKeyGen :789): hybrid switch key from the
    CKKS secret to the RLWE embedding of the LWE secret, both expressed in
    the intermediate 1-tower ring; plus S2C rotation keys."""
    from openfhe_tpu.lattice.basis import make_basis
    from openfhe_tpu.math import crt
    from openfhe_tpu.pke.keyswitch import hybrid
    from openfhe_tpu.lattice import rns_tools as rt

    st = cc._schswch
    n_ring = cc.ring_dim
    sk = keys.secret_key

    # aux modulus P for the intermediate hybrid keyswitch
    from openfhe_tpu.math import nbtheory
    p_aux = nbtheory.previous_prime(1 << 30, 2 * n_ring)
    while p_aux in (st.q_prime,) or p_aux in cc.moduli_q:
        p_aux = nbtheory.previous_prime(p_aux, 2 * n_ring)
    basis_qp = st.basis_int.concat(make_basis([p_aux], n_ring))

    s_from = _secret_coeff_signed(cc, sk)
    s_lwe = np.zeros(n_ring, np.int64)
    s_lwe[:st.n_lwe] = np.asarray(st.lwe_sk.s, np.int64)

    def embed(v):
        res = crt.to_residues_host(v, tuple(basis_qp.moduli))
        return ntt_fwd(jnp.asarray(res), basis_qp)

    sk_from = PrivateKey(s_qp=embed(s_from), key_tag=sk.key_tag)
    sk_to = PrivateKey(s_qp=embed(s_lwe), key_tag="lwe-rlwe")

    p_modq, p_modq_sh = rt._shoup_pair(
        [p_aux % st.q_prime, 0], basis_qp.moduli)
    st.swk = hybrid.keyswitch_gen(cc.next_rng(), sk_from, sk_to, basis_qp,
                                  k_q=1, num_parts=1,
                                  p_modq=p_modq, p_modq_sh=p_modq_sh)
    st.swk_tabs = hybrid.make_hybrid_tables(
        st.basis_int, make_basis([p_aux], n_ring), 1, 1)

    # S2C rotation keys (same BSGS ladder as bootstrap S2C)
    slots = st.slots
    bstep = st.params.bstep_lt or max(1, int(math.ceil(math.sqrt(slots))))
    st.s2c_bstep = bstep
    gstep = int(math.ceil(slots / bstep))
    rots = sorted({r for r in (
        list(range(1, bstep)) + [bstep * j for j in range(1, gstep)]
        + [slots]) if r})
    cc.EvalRotateKeyGen(sk, rots)
    cc.EvalConjugateKeyGen(sk)
    if sk.key_tag not in cc.eval_mult_keys:
        cc.EvalMultKeyGen(sk)


def eval_ckks_to_fhew_precompute(cc, scale: float = 1.0):
    """(reference EvalCKKStoFHEWPrecompute :838): S2C matrix diagonals with
    the scale that turns CKKS values into Q'/p_LWE-scaled LWE phases."""
    st = cc._schswch
    slots = st.slots
    sparse = slots < cc.ring_dim // 2
    u0, u1 = _decode_matrices(slots)
    bstep = st.s2c_bstep

    # after S2C, poly coeffs = value * gamma * sigma_out; mod-switch q0->Q'
    # multiplies by Q'/q0; want coeffs m*(Q'/p) => gamma = q0/(sigma_out*p)
    # where `scale` carries 1/p (reference passes scale=1/(p_LWE) typically)
    q0 = cc.moduli_q[0]
    k_chain = len(cc.moduli_q)
    sigma_out = cc.scf_real[k_chain - 1]
    gamma = scale * q0 / sigma_out

    if sparse:
        mat = np.concatenate([u0, u1], axis=1)            # [s, 2s]
        rows = 2 * slots
        diags = []
        for d in range(slots):
            idx = np.arange(rows)
            diag = mat[idx % slots, (idx + d) % (2 * slots)] * gamma
            diags.append(np.roll(diag, bstep * (d // bstep)))
        st.s2c_pt_slots = 2 * slots
    else:
        diags = []
        for d in range(slots):
            idx = np.arange(slots)
            diag = u0[idx % slots, (idx + d) % slots] * gamma
            diags.append(np.roll(diag, bstep * (d // bstep)))
        st.s2c_pt_slots = slots
    st.s2c_diags = diags


def eval_ckks_to_fhew(cc, ct: Ciphertext, num_ctxts: int = 0):
    """(reference EvalCKKStoFHEW :887): S2C -> drop to q0 -> mod switch to
    Q' -> key switch to the LWE key -> extract LWE samples -> round to q."""
    st = cc._schswch
    slots = st.slots
    num_ctxts = num_ctxts or slots
    n_ring = cc.ring_dim

    # Step 1: homomorphic decode
    ct_dec = eval_linear_transform(cc, ct, st.s2c_diags, st.s2c_bstep,
                                   st.s2c_pt_slots)
    ct_dec = cc.ModReduce(ct_dec)
    if st.s2c_pt_slots == 2 * slots:     # sparse: fold the two halves
        ct_dec = cc.EvalAdd(ct_dec, cc.EvalRotate(ct_dec, slots))

    # Step 2: drop to the last tower (q0)
    size = cc.size_ql(ct_dec.level)
    if size > 1:
        ct_dec = cc.LevelReduce(ct_dec, size - 1)
    basis1 = cc.basis_at(ct_dec.level)
    q0 = cc.moduli_q[0]

    # Step 3: exact modulus switch q0 -> Q' (host int64; boundary op)
    qp = st.q_prime
    c0 = np.asarray(ntt_inv(ct_dec.elements[0], basis1))[0].astype(np.int64)
    c1 = np.asarray(ntt_inv(ct_dec.elements[1], basis1))[0].astype(np.int64)

    def round_switch(x):
        xc = np.where(x > q0 // 2, x - q0, x)
        return ((xc * qp * 2 + q0) // (2 * q0)) % qp

    c0p = jnp.asarray(round_switch(c0)[None].astype(np.uint32))
    c1p = jnp.asarray(round_switch(c1)[None].astype(np.uint32))

    # Step 4: key switch to the RLWE-embedded LWE key
    from openfhe_tpu.pke.keyswitch import hybrid
    c0p_e = ntt_fwd(c0p, st.basis_int)
    c1p_e = ntt_fwd(c1p, st.basis_int)
    d0, d1 = hybrid.keyswitch_core(c1p_e, st.swk, st.swk_tabs)
    b_poly = np.asarray(ntt_inv(
        mo.add_mod(c0p_e, d0, st.basis_int.q), st.basis_int))[0]
    a_poly = np.asarray(ntt_inv(d1, st.basis_int))[0]

    # Step 5: extract LWE samples (negacyclic gather, vectorized)
    n = st.n_lwe
    gap = n_ring // (2 * slots)
    idxs = (np.arange(num_ctxts) * gap)[:, None]          # [B, 1]
    j = np.arange(n)[None, :]                             # [1, n]
    pos = idxs - j
    wrap = pos < 0
    a = np.where(wrap, a_poly[(n_ring + pos) % n_ring],
                 (qp - a_poly[pos % n_ring]) % qp)
    b = b_poly[idxs[:, 0]]

    # Step 6: round to the FHEW modulus
    qlwe = st.modulus_lwe
    if qlwe != qp:
        a = ((a.astype(np.int64) * qlwe * 2 + qp) // (2 * qp)) % qlwe
        b = ((b.astype(np.int64) * qlwe * 2 + qp) // (2 * qp)) % qlwe
    return lwe_mod.LWECiphertext(
        a=jnp.asarray(a.astype(np.uint32)),
        b=jnp.asarray(b.astype(np.uint32)),
        modulus=int(qlwe), pt_modulus=4)


# ---------------------------------------------------------------------------
# FHEW -> CKKS
# ---------------------------------------------------------------------------

def eval_fhew_to_ckks_keygen(cc, keys, lwe_sk):
    """(reference EvalFHEWtoCKKSKeyGen :959): encrypt the LWE secret under
    CKKS, replicated to fill the slots, plus LT rotation keys."""
    st = cc._schswch
    n = st.n_lwe
    n_po2 = 1 << int(math.ceil(math.log2(n)))
    s = np.zeros(n_po2)
    s[:n] = np.asarray(lwe_sk.s, np.float64)
    reps = (cc.ring_dim // 2) // n_po2
    s_rep = np.tile(s, max(1, reps))
    pt = cc.MakeCKKSPackedPlaintext(s_rep, slots=cc.ring_dim // 2)
    st.fhew_to_ckks_swk = cc.Encrypt(keys.public_key, pt)
    st.k_bound = 16.0 if n == 32 else 128.0
    st.cheb_fhew = _mod_func_coefficients(st.k_bound, 3)

    bstep = max(1, int(math.ceil(math.sqrt(n_po2))))
    gstep = int(math.ceil(n_po2 / bstep))
    pow2s = [1 << t for t in range(16) if (1 << t) <= st.slots]
    rots = sorted({r for r in (
        list(range(1, bstep)) + [bstep * j for j in range(1, gstep)]
        + [st.slots * (1 << t) for t in range(16)
           if st.slots * (1 << t) < cc.ring_dim // 2]
        + pow2s + [-r for r in pow2s]) if r})
    cc.EvalRotateKeyGen(keys.secret_key, rots)


def eval_fhew_to_ckks(cc, lwe_cts, num_ctxts: int = 0, num_slots: int = 0,
                      p: int = 4, pmin: float = 0.0, pmax: float = 2.0):
    """(reference EvalFHEWtoCKKS :1035): homomorphic partial decryption
    B - A*s followed by a sine-based modular reduction."""
    st = cc._schswch
    slots = num_slots or st.slots
    a_host = np.asarray(lwe_cts.a, np.float64)            # [B, n]
    b_host = np.asarray(lwe_cts.b, np.float64)
    num_values = num_ctxts or a_host.shape[0]
    n = a_host.shape[1]
    n_po2 = 1 << int(math.ceil(math.log2(n)))
    q_lwe = float(lwe_cts.modulus)
    k_bound = st.k_bound
    prescale = (1.0 / q_lwe) / k_bound

    # rectangular LT: out_i = sum_j A[i,j] * s_j against the replicated
    # secret; diagonals have length N/2 with row pattern repeating
    half = cc.ring_dim // 2
    amat = np.zeros((num_values, n_po2))
    amat[:, :n] = a_host[:num_values] * prescale
    bstep = max(1, int(math.ceil(math.sqrt(n_po2))))
    diags = []
    rows = np.arange(half)
    for d in range(n_po2):
        diag = amat[rows % num_values, (rows + d) % n_po2]
        diags.append(np.roll(diag, bstep * (d // bstep)))
    a_dot_s = eval_linear_transform(cc, st.fhew_to_ckks_swk, diags, bstep,
                                    half)
    a_dot_s = cc.ModReduce(a_dot_s)

    # B - A*s, prescaled into the Chebyshev range
    bvec = np.zeros(half)
    bvec[:num_values] = b_host[:num_values] * prescale
    b_pt = cc.MakeCKKSPackedPlaintext(bvec, level=a_dot_s.level,
                                      slots=half)
    diff = cc.EvalAdd(cc.EvalNegate(a_dot_s), b_pt)

    # sine-based modular reduction (double-angle seed, 3 iterations)
    y = cc.EvalChebyshevSeries(diff, st.cheb_fhew, -1.0, 1.0)
    if y.noise_deg > 1:
        y = cc.ModReduce(y)
    from openfhe_tpu.pke.fhe.ckks_bootstrap import apply_double_angle
    y = apply_double_angle(cc, y, 3)

    # post-scale to the CKKS encoding of the message
    post_scale = 2.0 * math.pi if 1 <= p <= 4 else float(p)
    post_bias = 0.0
    if pmin != 0:
        post_scale *= (pmax - pmin) / 4.0
        post_bias = (pmax - pmin) / 4.0
    mask = np.zeros(half)
    mask[:num_values] = post_scale
    y = cc.EvalMult(y, cc.MakeCKKSPackedPlaintext(
        mask, level=y.level, slots=half))
    y = cc.ModReduce(y)
    if post_bias != 0:
        bias = np.zeros(half)
        bias[:num_values] = post_bias
        y = cc.EvalAdd(y, cc.MakeCKKSPackedPlaintext(
            bias, level=y.level, slots=half))

    # back to sparse packing if requested
    if slots < half:
        j = slots
        while j < half:
            y = cc.EvalAdd(y, cc.EvalRotate(y, j))
            j <<= 1
        # the folded copies each carry the message once; only the first
        # `num_values` slots are meaningful
        y = y.replace(slots=slots)
    return y


# ---------------------------------------------------------------------------
# comparison / min / max via FHEW sign
# ---------------------------------------------------------------------------

def _min_max_tournament(cc, ct, public_key, num_values: int,
                        num_slots: int = 0, p_lwe: int = 0,
                        scale_sign: float = 1.0,
                        compute_max: bool = False):
    """Tournament min/max with argmin one-hot indicator (reference
    EvalMinSchemeSwitching :1402 / EvalMaxSchemeSwitching)."""
    st = cc._schswch
    if p_lwe:
        eval_ckks_to_fhew_precompute(cc, scale_sign / p_lwe)
    slots = num_slots or st.slots
    c_ind = cc.Encrypt(public_key, cc.MakeCKKSPackedPlaintext(
        np.ones(num_values), slots=slots))
    new_ct = ct
    m_step = 1
    while m_step < num_values:
        nh = num_values // (2 * m_step)
        c_diff = cc.EvalSub(new_ct, cc.EvalRotate(new_ct, nh))
        lwe_ct = eval_ckks_to_fhew(cc, c_diff, nh)
        signs = st.cc_lwe.EvalSign(lwe_ct, scheme_switch=True)
        sel = eval_fhew_to_ckks(cc, signs, nh, slots, 4, -1.0, 1.0)
        # "ones" only on the first nh slots (zero-padded), so the
        # complement never leaks into the wrapped region (reference
        # ptxtOnes of length n)
        ones = np.zeros(slots)
        ones[:nh] = 1.0
        ones_pt = cc.MakeCKKSPackedPlaintext(ones, level=sel.level,
                                             slots=slots)
        if compute_max:
            sel = cc.EvalAdd(cc.EvalNegate(sel), ones_pt)
        # combined mask: sel on [0,nh), (1-sel) shifted onto [nh,2nh)
        compl = cc.EvalAdd(cc.EvalNegate(sel), ones_pt)
        mask = cc.EvalAdd(sel, cc.EvalRotate(compl, -nh))
        if m_step > 1:
            j = num_values // m_step
            while j < num_values:
                mask = cc.EvalAdd(mask, cc.EvalRotate(mask, -j))
                j <<= 1
        new_ct = cc.EvalMult(new_ct, mask)
        new_ct = cc.EvalAdd(new_ct, cc.EvalRotate(new_ct, nh))
        c_ind = cc.EvalMult(c_ind, mask)
        m_step <<= 1
    return new_ct, c_ind


def eval_min_scheme_switching(cc, ct, public_key, num_values: int,
                              num_slots: int = 0, p_lwe: int = 0,
                              scale_sign: float = 1.0):
    return _min_max_tournament(cc, ct, public_key, num_values, num_slots,
                               p_lwe, scale_sign, compute_max=False)


def eval_max_scheme_switching(cc, ct, public_key, num_values: int,
                              num_slots: int = 0, p_lwe: int = 0,
                              scale_sign: float = 1.0):
    return _min_max_tournament(cc, ct, public_key, num_values, num_slots,
                               p_lwe, scale_sign, compute_max=True)


def eval_compare_switch_precompute(cc, p_lwe: int = 0, scale_sign: float = 1.0):
    """(reference EvalCompareSwitchPrecompute :1345)"""
    st = cc._schswch
    if p_lwe == 0:
        p_lwe = st.modulus_lwe // (2 * st.cc_lwe.beta)
    scale = 1.0 / (p_lwe * scale_sign) if p_lwe else scale_sign
    eval_ckks_to_fhew_precompute(cc, scale)


def eval_compare_scheme_switching(cc, ct1, ct2, num_ctxts: int = 0,
                                  num_slots: int = 0):
    """sign(ct1 - ct2) via FHEW EvalSign (reference
    EvalCompareSchemeSwitching :1368): returns CKKS ct with 1 where
    ct1 < ct2 ... (reference convention: sign of the difference)."""
    st = cc._schswch
    diff = cc.EvalSub(ct1, ct2)
    lwe_cts = eval_ckks_to_fhew(cc, diff, num_ctxts)
    signs = st.cc_lwe.EvalSign(lwe_cts, scheme_switch=True)
    # EvalSign returns +-q/4 phases mod q; repack through FHEW->CKKS
    return eval_fhew_to_ckks(cc, signs, num_ctxts, num_slots, 4, -1.0, 1.0)
