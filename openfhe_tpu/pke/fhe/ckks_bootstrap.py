"""CKKS bootstrapping: ModRaise -> CoeffsToSlots -> EvalMod -> SlotsToCoeffs.

Reference analog: /root/reference src/pke/lib/scheme/ckksrns/ckksrns-fhe.cpp
(EvalBootstrapSetup :85-259, EvalBootstrapKeyGen :264, EvalBootstrap :429-837,
AdjustCiphertext :2228, ApplyDoubleAngleIterations, EvalLinearTransform) and
the matrix definitions U0[i][j] = omega^{j*5^i}, omega = exp(2*pi*i/(4*slots))
(ckksrns-fhe.cpp:169-259).

TPU-first redesign decisions (vs. the reference):
  * Scale bookkeeping rides on our exact float64 per-ciphertext scale instead
    of the reference's power-of-two correction-factor algebra (correction /
    deg / post / MultByInteger dance, ckksrns-fhe.cpp:532-546). We still apply
    a correction scale-down before ModRaise for sine accuracy and an integer
    multiply at the end for noise headroom, but none of it requires q0 to be
    near a power of two.
  * The Chebyshev coefficients of the double-angle-reduced sine,
        f(y) = (2pi)^(-1/2^R) * cos(2*pi*(K*y)/2^R - pi/2^(R+1)),
    are interpolated at setup with numpy to adaptive degree, replacing the
    reference's hardcoded g_coefficients* tables (ckksrns-fhe.h:436-520).
    R double-angle iterations then yield sin(2*pi*K*y)/(2*pi).
  * The modulus-raise clamp |I| <= K is sized from the actual ring dimension
    (K ~ 8*sqrt(N/18) for uniform ternary secrets) instead of a fixed 512,
    which preserves precision at small N; it reproduces K_UNIFORM=512
    (ckksrns-fhe.h:424) at N = 2^16.
  * All hot steps are jitted tensor ops: ModRaise is a batched centered-lift
    over the tower axis; linear transforms are BSGS ladders of rotations
    (automorphism gathers + hybrid keyswitch) and elementwise multiplies.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from openfhe_tpu.math import crt
from openfhe_tpu.math import modops as mo
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from openfhe_tpu.pke.ciphertext import Ciphertext
from openfhe_tpu.pke.fhe import fft_transform as fftt


# ---------------------------------------------------------------------------
# setup: precomputed tables
# ---------------------------------------------------------------------------

@dataclass
class CKKSBootstrapPrecom:
    """Per-slot-count bootstrap precompute (reference CKKSBootstrapPrecom)."""
    slots: int
    k_bound: float                 # K: clamp on the mod-raise overflow count
    r_iters: int                   # double-angle iteration count
    cheb_coeffs: list              # Chebyshev coeffs (c0 doubled, our conv.)
    correction: int                # log2 of the pre-ModRaise scale-down
    # BSGS diagonals: numpy complex arrays, already pre-rotated for BSGS
    c2s_diags: list = field(default_factory=list)
    s2c_diags: list = field(default_factory=list)
    bstep_enc: int = 0
    bstep_dec: int = 0
    pt_slots: int = 0              # slot count used to encode LT plaintexts
    sparse: bool = False
    runtime_scalar: float = 1.0    # folded scalar applied right after raise
    boost1: int = 1                # integer headroom multiplier after EvalMod
    boost2: int = 1                # integer headroom multiplier after S2C
    # FFT-factorized C2S/S2C (level budget > 1): lists of fft_transform
    # .FFTStage in application order; None selects the dense transform
    c2s_stages: list | None = None
    s2c_stages: list | None = None


def _adaptive_k(n: int, secret_dist) -> int:
    """Clamp bound K on |I| in ct = m + q0*I after raise.

    For a uniform ternary secret, coefficient of c0 + c1*s has std
    ~ q0*sqrt(N/18); a 7-sigma bound keeps the failure probability
    negligible. The reference uses a fixed K_UNIFORM=512 (ckksrns-fhe.h:424),
    which this matches at N=2^16; sizing by N preserves precision at small N
    (K directly divides the message's signal-to-noise budget).

    SPARSE_TERNARY secrets (hamming weight 192, rns_pke.keygen) bound
    |I| by the weight instead of N: std ~ sqrt((h+1)/12), giving the
    reference's K_SPARSE = 28 class (ckksrns-fhe.h:418) — a ~18x smaller
    sine range at N=2^16, so a far cheaper EvalMod and a larger message
    signal per slot.
    """
    from openfhe_tpu.pke.constants import SecretKeyDist
    if secret_dist == SecretKeyDist.SPARSE_TERNARY:
        h = 192
        return max(16, math.ceil(7.0 * math.sqrt((h + 1) / 12.0)))
    sigma = math.sqrt(n / 18.0)
    return max(16, math.ceil(7.0 * sigma))


def _mod_func_coefficients(k_bound: float, r_iters: int) -> list:
    """Chebyshev coefficients (on [-1,1]) of the double-angle seed function.

    After r double-angle steps ct <- 2*ct^2 - (2pi)^(-2^i) the series value
    becomes sin(2*pi*K*y)/(2*pi) (see ApplyDoubleAngleIterations,
    ckksrns-fhe.cpp; derivation in module docstring).
    """
    two_pi = 2.0 * math.pi
    pow2r = float(1 << r_iters)
    amp = two_pi ** (-1.0 / pow2r)

    def f(y):
        return amp * np.cos(two_pi * (k_bound * y) / pow2r
                            - math.pi / (2.0 * pow2r))

    deg = 16
    while deg < 4096:
        c = np.polynomial.chebyshev.Chebyshev.interpolate(f, deg)
        # estimate tail error by the trailing coefficient magnitudes
        tail = np.abs(c.coef[-4:]).max()
        if tail < 1e-13:
            break
        deg *= 2
    coeffs = list(c.coef)
    # trim negligible tail
    while len(coeffs) > 8 and abs(coeffs[-1]) < 1e-14:
        coeffs.pop()
    coeffs[0] *= 2.0    # our EvalChebyshevSeries halves c0 (OpenFHE conv.)
    return coeffs


def _bsgs_diagonals(mat_rows: np.ndarray, n_diags: int, bstep: int,
                    scale: float) -> list:
    """Generalized diagonals of a (rows x cols) matrix, pre-rotated for BSGS.

    diag_d[i] = M[i mod rows][(i + d) mod cols], length lcm-padded to `rows`
    (callers pass matrices whose diagonal length equals rows). Diagonal d is
    right-rotated by bstep*(d // bstep) so the giant-step rotation can be
    applied to the inner sum (reference EvalLinearTransformPrecompute).
    """
    rows, cols = mat_rows.shape
    diags = []
    for d in range(n_diags):
        idx_i = np.arange(rows)
        diag = mat_rows[idx_i % rows, (idx_i + d) % cols] * scale
        diags.append(np.roll(diag, bstep * (d // bstep)))
    return diags


def get_bootstrap_depth(level_budget=(1, 1), secret_key_dist=None,
                        n: int = 1 << 16) -> int:
    """Multiplicative depth the bootstrap pipeline consumes (reference
    FHECKKSRNS::GetBootstrapDepth, ckksrns-fhe.cpp:2199) — size mult_depth
    as usable_depth + this.

    Counted from our pipeline: correction adjust (1) + post-raise
    normalization (1) + lEnc + conjugate reduce (1) + Chebyshev
    Paterson-Stockmeyer depth + double-angle iterations + lDec.
    """
    k = _adaptive_k(n, secret_key_dist)
    r_iters = 6 if k > 64 else 4
    deg = len(_mod_func_coefficients(k, r_iters)) - 1
    cheb_depth = int(math.ceil(math.log2(max(2, deg)))) + 2
    return 2 + int(level_budget[0]) + 1 + cheb_depth + r_iters \
        + int(level_budget[1])


def eval_bootstrap_setup(cc, level_budget=(1, 1), dim1=(0, 0), slots: int = 0,
                         correction_factor: int = 0) -> None:
    """(reference EvalBootstrapSetup, ckksrns-fhe.cpp:85)

    level_budget = (lEnc, lDec): 1 selects the dense one-level linear
    transform; > 1 selects the FFT-factorized staged transform consuming
    lEnc/lDec levels (fft_transform.py) — required at production slot counts
    where the dense transform's slots-many diagonals are infeasible.
    """
    n = cc.ring_dim
    slots = slots or n // 2
    if slots & (slots - 1):
        raise ValueError("bootstrap slots must be a power of two")
    sparse = slots < n // 2

    k_bound = _adaptive_k(n, cc.params.secret_key_dist)
    r_iters = 6 if k_bound > 64 else 4
    if correction_factor == 0:
        # balances sine-linearization error (grows as 4^-c) against noise
        # headroom lost to the scale-down (grows as 2^c)
        correction_factor = 4
    cheb = _mod_func_coefficients(k_bound, r_iters)

    # --- linear-transform matrices (ckksrns-fhe.cpp:169-259) ---
    m = 4 * slots
    omega = np.exp(2j * np.pi / m)
    rot_group = np.array([pow(5, i, m) for i in range(slots)])
    j_idx = np.arange(slots)
    u0 = omega ** (np.outer(rot_group, j_idx) % m)       # [slots, slots]
    u0h = u0.conj().T
    u1 = 1j * u0
    u1h = u1.conj().T

    bstep_enc = max(1, int(math.ceil(math.sqrt(slots))))
    bstep_dec = bstep_enc

    # Scale bookkeeping (all setup-time constants, since the canonical
    # FLEXIBLE scale at the 1-tower level is known):
    #   sigma1   : scale of the adjusted ciphertext entering ModRaise
    #   enc_scale: 1/K folded into the C2S matrix
    #   runtime  : sigma1/(N*q0), so slots before EvalMod hold z_k/(K*q0)
    #   dec_scale: undoes the residual value factor so the output decodes
    #              to m on a canonical scale (reference scaleDec = 1/pre)
    if not cc._flexible():
        raise ValueError("CKKS bootstrapping requires FLEXIBLEAUTO scaling "
                         "(28-bit moduli make FIXED-mode drift fatal)")
    d = getattr(cc, "comp_deg", 1)
    n_levels = len(cc.scf_real)
    q0 = 1
    for q in cc.moduli_q[:d]:
        q0 *= q                       # composite: q0 = first level's product
    sigma1 = cc.scf_real[n_levels - 1]
    correction = correction_factor
    boost1 = max(1, int(round(float(q0) / sigma1)))
    if boost1 > 4:
        import warnings
        warnings.warn(
            f"bootstrap SNR: first-level modulus q0 is {boost1}x the "
            f"scaling factor; the EvalMod signal m/q0 shrinks by that "
            f"factor while the transform noise floor does not, costing "
            f"~log2({boost1}) = {math.log2(boost1):.0f} precision bits "
            f"(boost1 re-amplifies the message only AFTER the noise is "
            f"mixed in). Size first_mod_size <= scaling_mod_size + 2 "
            f"(reference: 60-bit q0 vs 59-bit scale, ckksrns-fhe.cpp).",
            stacklevel=3)
    boost2 = 1 << correction
    v_factor = math.pow(2.0, -correction) * sigma1 / float(q0) \
        * boost1 * boost2
    enc_scale = 1.0 / k_bound
    dec_scale = 1.0 / v_factor

    log2s = max(1, int(math.log2(slots)))
    l_enc = max(1, min(int(level_budget[0]), log2s))
    l_dec = max(1, min(int(level_budget[1]), log2s))

    # The staged (FFT-collapsed) transforms compose to U0 * P_bitrev —
    # slots come out in bit-reversed order, which the staged inverse
    # consumes (budget-independent, so any staged+staged combo is
    # consistent; tests cover (3,2)/(2,3)). The dense diagonals are the
    # natural-order U0. MIXING the kinds therefore decodes permuted
    # garbage, so a mixed budget builds the budget-1 side as a ONE-STAGE
    # staged transform (2s-1 diagonals instead of s — one level, same
    # depth) and stays in the staged convention. The reference never
    # exercises the mix (UnitTestBootstrap.cpp budgets: (1,1),(2,2),
    # (3,2),(3,3),(4,4),(8,8)); we make it correct instead of silently
    # wrong.
    mixed = (l_enc == 1) != (l_dec == 1)

    c2s, s2c = [], []
    c2s_stages = s2c_stages = None
    pt_slots = 2 * slots if sparse else slots
    if l_enc > 1 or mixed:
        c2s_stages, _ = fftt.build_c2s_stages(slots, n, l_enc, dim1[0],
                                              enc_scale)
    elif sparse:
        # vertical [U0^H; U1^H]: (2s x s); s diagonals of length 2s
        mat_c2s = np.concatenate([u0h, u1h], axis=0)      # [2s, s]
        c2s = _bsgs_diagonals(mat_c2s, slots, bstep_enc, enc_scale)
    else:
        c2s = _bsgs_diagonals(u0h, slots, bstep_enc, enc_scale)

    if l_dec > 1 or mixed:
        s2c_stages, _ = fftt.build_s2c_stages(slots, n, l_dec, dim1[1],
                                              dec_scale)
    elif sparse:
        # horizontal [U0 | U1]: (s x 2s); s diagonals of length 2s read
        # through a (2s x 2s) wrap of the row index
        mat_s2c = np.concatenate([u0, u1], axis=1)        # [s, 2s]
        rows = 2 * slots
        for d in range(slots):
            idx = np.arange(rows)
            diag = mat_s2c[idx % slots, (idx + d) % (2 * slots)] * dec_scale
            s2c.append(np.roll(diag, bstep_dec * (d // bstep_dec)))
    else:
        s2c = _bsgs_diagonals(u0, slots, bstep_dec, dec_scale)

    cc._boot_precom = getattr(cc, "_boot_precom", {})
    cc._boot_precom[slots] = CKKSBootstrapPrecom(
        slots=slots, k_bound=float(k_bound), r_iters=r_iters,
        cheb_coeffs=cheb, correction=correction,
        c2s_diags=c2s, s2c_diags=s2c, bstep_enc=bstep_enc,
        bstep_dec=bstep_dec, pt_slots=pt_slots, sparse=sparse,
        runtime_scalar=sigma1 / (float(n) * float(q0)),
        boost1=boost1, boost2=boost2,
        c2s_stages=c2s_stages, s2c_stages=s2c_stages)


def bootstrap_rotation_indices(cc, slots: int) -> list:
    """All rotation indices EvalBootstrap will use for `slots`."""
    p = cc._boot_precom[slots]
    n = cc.ring_dim
    idx = set()
    # BSGS baby and giant steps (enc and dec share bstep here)
    for stages, b in ((p.c2s_stages, p.bstep_enc),
                      (p.s2c_stages, p.bstep_dec)):
        if stages is not None:
            idx.update(fftt.stage_rotation_indices(stages))
        else:
            g = int(math.ceil(slots / b))
            idx.update(range(1, b))
            idx.update(b * j for j in range(1, g))
    if p.sparse:
        j = slots
        while j < n // 2:
            idx.add(j)
            j <<= 1
        idx.add(slots)
    idx.discard(0)
    return sorted(idx)


def eval_bootstrap_keygen(cc, sk, slots: int = 0) -> None:
    """(reference EvalBootstrapKeyGen, ckksrns-fhe.cpp:264)"""
    slots = slots or cc.ring_dim // 2
    cc.EvalRotateKeyGen(sk, bootstrap_rotation_indices(cc, slots))
    cc.EvalConjugateKeyGen(sk)
    if cc.eval_mult_keys.get(sk.key_tag) is None:
        cc.EvalMultKeyGen(sk)


# ---------------------------------------------------------------------------
# primitive ops used by the pipeline
# ---------------------------------------------------------------------------

def mod_raise(cc, ct: Ciphertext) -> Ciphertext:
    """Raise a last-level ciphertext to the full modulus chain.

    Residues mod q0 are centered-lifted to integers in (-q0/2, q0/2] and
    re-reduced modulo every q_i (reference: the COEFFICIENT-format re-parent
    loop in EvalBootstrap, ckksrns-fhe.cpp:592-600). Single-word chains run
    fully on device (elementwise, jittable); composite chains (q0 = product
    of comp_deg towers, reference ExtendCiphertext ckksrns-fhe.cpp:2290)
    lift through the exact host CRT kernel.
    """
    d = getattr(cc, "comp_deg", 1)
    size = cc.size_ql(ct.level)
    if size != d:
        ct = cc.LevelReduce(ct, (size - d) // d)
    full = cc.basis_q

    if d == 1:
        basis1 = cc.basis_at(ct.level).slice(0, 1)
        q0 = cc.moduli_q[0]
        half = np.uint32(q0 >> 1)
        q0_mod_qi = jnp.asarray(
            np.array([[q0 % q] for q in cc.moduli_q], np.uint32))

        def raise_one(elem):
            u = ntt_inv(elem[..., :1, :], basis1)        # [1, N] in [0, q0)
            r = mo.barrett_u32(u, full.q, full.m32)      # u mod q_i
            r = jnp.where(u > half, mo.sub_mod(r, q0_mod_qi, full.q), r)
            return ntt_fwd(r, full)
    else:
        from openfhe_tpu.lattice import rns_tools as rtool
        basis_d = cc.basis_q.slice(0, d)
        group = tuple(cc.moduli_q[:d])
        all_mods = tuple(cc.moduli_q)
        # device-only centered lift: shift by B/2, EXACT CRT switch
        # (HPS overflow count), unshift — jittable, unlike the former
        # host big-int interpolation
        key = ("modraise", group, all_mods)
        cache = getattr(cc, "_modraise_cache", None)
        if cache is None:
            cache = cc._modraise_cache = {}
        if key not in cache:
            big_b = 1
            for b in group:
                big_b *= b
            half = big_b // 2
            cache[key] = (
                rtool.make_switch_tables(group, all_mods),
                rtool._shoup_pair([half % b for b in group], group),
                rtool._shoup_pair([half % q for q in all_mods], all_mods),
            )
        sw_tab, (hin, _hin_sh), (hout, _hout_sh) = cache[key]

        def raise_one(elem):
            u = ntt_inv(elem[..., :d, :], basis_d)
            u = mo.add_mod(u, hin, basis_d.q)
            v = rtool.switch_crt_basis_exact(u, basis_d, full, sw_tab)
            v = mo.sub_mod(v, hout, full.q)
            return ntt_fwd(v, full)

    return ct.replace(elements=tuple(raise_one(c) for c in ct.elements),
                      level=0)


def mult_by_monomial(cc, ct: Ciphertext, power: int) -> Ciphertext:
    """ct * X^power (reference MultByMonomialInPlace). EVAL-domain
    elementwise multiply by the NTT of the monomial; no scale change."""
    n = cc.ring_dim
    power = power % (2 * n)
    sign = 1
    if power >= n:
        power -= n
        sign = -1
    coeffs = np.zeros(n, np.int64)
    coeffs[power] = sign
    size = cc.size_ql(ct.level)
    basis = cc.basis_at(ct.level)
    res = crt.to_residues_host(coeffs, tuple(cc.moduli_q[:size]))
    mono = ntt_fwd(jnp.asarray(res), basis)
    mm = lambda x: mo.mul_mod(x, mono, basis.q, basis.r32, basis.r32_sh,
                              basis.m32)
    return ct.replace(elements=tuple(mm(c) for c in ct.elements))


def mult_by_integer(cc, ct: Ciphertext, value: int) -> Ciphertext:
    """ct * integer without scale change (reference MultByIntegerInPlace)."""
    size = cc.size_ql(ct.level)
    basis = cc.basis_at(ct.level)
    from openfhe_tpu.lattice import rns_tools as rt
    c, c_sh = rt._shoup_pair([value % q for q in cc.moduli_q[:size]],
                             cc.moduli_q[:size])
    mm = lambda x: mo.mul_mod_shoup(x, c, c_sh, basis.q)
    return ct.replace(elements=tuple(mm(e) for e in ct.elements))


def eval_linear_transform(cc, ct: Ciphertext, diags: list, bstep: int,
                          pt_slots: int) -> Ciphertext:
    """BSGS diagonal-method linear transform (reference EvalLinearTransform).

    out = sum_j rot_{b*j}( sum_i diag'_{b*j+i} * rot_i(ct) ), with diagonals
    pre-rotated by -b*j at setup. Rotations on the baby steps are shared.
    """
    n_diags = len(diags)
    gstep = int(math.ceil(n_diags / bstep))
    rots = {0: ct}
    # hoisting: decompose c1 once, share across all baby-step rotations
    # (reference EvalLinearTransform's EvalFastRotationPrecompute)
    hoisted = cc.EvalFastRotationPrecompute(ct)
    for i in range(1, min(bstep, n_diags)):
        rots[i] = cc.EvalFastRotation(ct, i, digits=hoisted)
    outer = None
    for j in range(gstep):
        inner = None
        for i in range(bstep):
            d = bstep * j + i
            if d >= n_diags:
                break
            pt = cc._cached_plaintext(diags[d], ct.level, pt_slots)
            term = cc._eval_mult_plain(rots[i], pt)
            inner = term if inner is None else cc.EvalAdd(inner, term)
        if j:
            inner = cc.EvalRotate(inner, bstep * j)
        outer = inner if outer is None else cc.EvalAdd(outer, inner)
    return outer


def apply_double_angle(cc, ct: Ciphertext, num_iter: int) -> Ciphertext:
    """(reference ApplyDoubleAngleIterations) r steps of
    ct <- 2*ct^2 - (2pi)^(-2^i), turning the reduced-angle cosine into
    sin(2*pi*K*y)/(2*pi)."""
    for i in range(1 - num_iter, 1):
        scalar = -math.pow(2.0 * math.pi, -math.pow(2.0, i))
        sq = cc.EvalSquare(ct)
        ct = cc.EvalAdd(cc.EvalAdd(sq, sq), scalar)
        if ct.noise_deg > 1:
            ct = cc.ModReduce(ct)
    return ct


# ---------------------------------------------------------------------------
# the bootstrap pipeline
# ---------------------------------------------------------------------------

def eval_bootstrap(cc, ct: Ciphertext, num_iterations: int = 1,
                   precision: int = 0) -> Ciphertext:
    """(reference EvalBootstrap, ckksrns-fhe.cpp:429)

    Returns a ciphertext encrypting the same message at a much lower level.
    """
    if num_iterations == 2:
        return _eval_bootstrap_two_rounds(cc, ct, precision)
    precom = getattr(cc, "_boot_precom", {})
    if ct.slots not in precom:
        raise ValueError(f"no bootstrap precomputation for {ct.slots} slots;"
                         " call EvalBootstrapSetup(slots=...) first")
    if ct.key_tag not in cc.eval_automorphism_keys:
        raise ValueError("bootstrapping keys have not been generated; call "
                         "EvalBootstrapKeyGen before EvalBootstrap")
    p = precom[ct.slots]
    n = cc.ring_dim
    slots = p.slots
    n_levels = len(cc.scf_real)

    # ---- adjust: scale the message down by 2^correction for sine accuracy
    # and land canonically on the last level (reference AdjustCiphertext,
    # ckksrns-fhe.cpp:2228) ----
    if ct.noise_deg > 1:
        ct = cc.ModReduce(ct)
    if cc.size_ql(ct.level) < 2 * getattr(cc, "comp_deg", 1):
        raise ValueError("bootstrap input needs >= 2 levels for the "
                         "correction scale-down")
    l_pen = n_levels - 2                        # penultimate level
    pt_scale = cc.scf_real[l_pen] ** 2 / ct.scale
    ct = cc._scalar_mult_raw(ct, math.pow(2.0, -p.correction), pt_scale)
    if ct.level < l_pen:
        ct = cc.LevelReduce(ct, l_pen - ct.level)
    ct = cc.ModReduce(ct)           # (1 tower, deg 1, scale scf[k-1])

    # ---- ModRaise ----
    raised = mod_raise(cc, ct)

    # ---- normalization scalar: after C2S(+conj) slots must hold
    # z_k / (K * q0); the C2S matrix already carries 1/K (setup), and the
    # identity conj(A)^T A = s*I contributes 2*slots * partial-sum count
    # = N (module docstring derivation), so the runtime scalar is
    # sigma1 / (N * q0). Encoded so the product lands on the canonical
    # deg-2 scale at level 0. ----
    raised = cc._scalar_mult_raw(raised, p.runtime_scalar,
                                 cc.scf_real[0] ** 2 / raised.scale)

    if p.sparse:
        # PartialSum: fold onto the dim-2s subring (ckksrns-fhe.cpp:743-745)
        j = slots
        while j < n // 2:
            raised = cc.EvalAdd(raised, cc.EvalRotate(raised, j))
            j <<= 1
    raised = cc.ModReduce(raised)

    # ---- CoeffsToSlots ----
    if p.c2s_stages is not None:
        ctxt_enc = fftt.eval_fft_stages(cc, raised, p.c2s_stages, p.pt_slots)
    else:
        ctxt_enc = eval_linear_transform(cc, raised, p.c2s_diags,
                                         p.bstep_enc, p.pt_slots)
    conj = cc.EvalConjugate(ctxt_enc)
    if p.sparse:
        ctxt_enc = cc.EvalAdd(ctxt_enc, conj)
        ctxt_enc = cc.ModReduce(ctxt_enc)
        parts = [ctxt_enc]
    else:
        ctxt_enc_i = cc.EvalSub(ctxt_enc, conj)
        ctxt_enc = cc.EvalAdd(ctxt_enc, conj)
        ctxt_enc_i = mult_by_monomial(cc, ctxt_enc_i, 3 * slots)
        ctxt_enc = cc.ModReduce(ctxt_enc)
        ctxt_enc_i = cc.ModReduce(ctxt_enc_i)
        parts = [ctxt_enc, ctxt_enc_i]

    # ---- EvalMod: Chebyshev seed + double-angle ----
    # slots hold z_k / (K*q0) in [-1, 1]; no affine map needed.
    out_parts = []
    for part in parts:
        y = cc.EvalChebyshevSeries(part, p.cheb_coeffs, -1.0, 1.0)
        if y.noise_deg > 1:
            y = cc.ModReduce(y)
        y = apply_double_angle(cc, y, p.r_iters)
        out_parts.append(y)

    if p.sparse:
        ctxt_mod = out_parts[0]
    else:
        enc_i = mult_by_monomial(cc, out_parts[1], slots)
        ctxt_mod = cc.EvalAdd(out_parts[0], enc_i)

    # slots now hold mu_k / q0. Boost coefficients back up with integer
    # multiplies (no noise growth); the exact residual value factor was
    # folded into the S2C matrix scale at setup, so the output decodes to m
    # on a canonical scale with no metadata patching.
    if p.boost1 > 1:
        ctxt_mod = mult_by_integer(cc, ctxt_mod, p.boost1)

    # ---- SlotsToCoeffs ----
    if p.s2c_stages is not None:
        ctxt_dec = fftt.eval_fft_stages(cc, ctxt_mod, p.s2c_stages,
                                        p.pt_slots)
    else:
        ctxt_dec = eval_linear_transform(cc, ctxt_mod, p.s2c_diags,
                                         p.bstep_dec, p.pt_slots)
    ctxt_dec = cc.ModReduce(ctxt_dec)
    if p.sparse:
        ctxt_dec = cc.EvalAdd(ctxt_dec, cc.EvalRotate(ctxt_dec, slots))
    if p.boost2 > 1:
        ctxt_dec = mult_by_integer(cc, ctxt_dec, p.boost2)
    return ctxt_dec.replace(slots=ct.slots)


def eval_bootstrap_stc_first(cc, ct: Ciphertext, num_iterations: int = 1,
                             precision: int = 0) -> Ciphertext:
    """(reference EvalBootstrapStCFirst, ckksrns-fhe.cpp:839)

    Slots-encoding bootstrap: the pipeline is the standard one reordered —
    SlotsToCoeffs runs FIRST at the depleted (cheap, low-tower) end, moving
    slot data into polynomial coefficients; then ModRaise -> CoeffsToSlots
    -> EvalMod return the refreshed data in SLOT form with no trailing
    transform.  All folded constants (dec_scale, 1/K, runtime scalar,
    boosts) are the standard ones — they commute along the chain, with
    boost2 moved to the very end so the pre-sine residual stays small.
    """
    precom = getattr(cc, "_boot_precom", {})
    if ct.slots not in precom:
        raise ValueError(f"no bootstrap precomputation for {ct.slots} slots")
    p = precom[ct.slots]
    n = cc.ring_dim
    slots = p.slots
    n_levels = len(cc.scf_real)

    if num_iterations == 2:
        pow2 = 1 << (precision or 3)
        ct1 = eval_bootstrap_stc_first(cc, ct, 1)
        if ct1.noise_deg > 1:
            ct1 = cc.ModReduce(ct1)
        if ct.level <= ct1.level:
            return ct1
        ct1_down = cc.LevelReduce(ct1, ct.level - ct1.level)
        e_up = cc.EvalSub(
            mult_by_integer(cc, ct1_down, pow2).replace(scale=ct.scale),
            mult_by_integer(cc, ct, pow2))
        err_boot = eval_bootstrap_stc_first(cc, e_up, 1)
        if err_boot.noise_deg > 1:
            err_boot = cc.ModReduce(err_boot)
        return cc.EvalSub(ct1, err_boot.replace(
            scale=err_boot.scale * pow2))

    # ---- deplete to the S2C start level ----
    if ct.noise_deg > 1:
        ct = cc.ModReduce(ct)
    l_dec = len(p.s2c_stages) if p.s2c_stages is not None else 1
    need = l_dec + 2                        # S2C levels + adjust + floor
    if cc.size_ql(ct.level) < need:
        raise ValueError("StC-first bootstrap input needs at least "
                         f"{need} towers")
    target_lvl = n_levels - need
    if ct.level < target_lvl:
        ct = cc.LevelReduce(ct, target_lvl - ct.level)

    # ---- SlotsToCoeffs FIRST ----
    if p.s2c_stages is not None:
        ctxt_dec = fftt.eval_fft_stages(cc, ct, p.s2c_stages, p.pt_slots)
    else:
        ctxt_dec = eval_linear_transform(cc, ct, p.s2c_diags, p.bstep_dec,
                                         p.pt_slots)
    ctxt_dec = cc.ModReduce(ctxt_dec)
    if p.sparse:
        ctxt_dec = cc.EvalAdd(ctxt_dec, cc.EvalRotate(ctxt_dec, slots))

    # ---- adjust (2^-correction) and land canonically on 1 tower ----
    l_pen = n_levels - 2
    pt_scale = cc.scf_real[l_pen] ** 2 / ctxt_dec.scale
    ctxt_dec = cc._scalar_mult_raw(ctxt_dec, math.pow(2.0, -p.correction),
                                   pt_scale)
    ctxt_dec = cc.ModReduce(ctxt_dec)

    # ---- ModRaise + normalization (identical to the standard pipeline) --
    raised = mod_raise(cc, ctxt_dec)
    raised = cc._scalar_mult_raw(raised, p.runtime_scalar,
                                 cc.scf_real[0] ** 2 / raised.scale)
    if p.sparse:
        j = slots
        while j < n // 2:
            raised = cc.EvalAdd(raised, cc.EvalRotate(raised, j))
            j <<= 1
    raised = cc.ModReduce(raised)

    # ---- CoeffsToSlots ----
    if p.c2s_stages is not None:
        ctxt_enc = fftt.eval_fft_stages(cc, raised, p.c2s_stages, p.pt_slots)
    else:
        ctxt_enc = eval_linear_transform(cc, raised, p.c2s_diags,
                                         p.bstep_enc, p.pt_slots)
    conj = cc.EvalConjugate(ctxt_enc)
    if p.sparse:
        ctxt_enc = cc.ModReduce(cc.EvalAdd(ctxt_enc, conj))
        parts = [ctxt_enc]
    else:
        ctxt_enc_i = cc.EvalSub(ctxt_enc, conj)
        ctxt_enc = cc.EvalAdd(ctxt_enc, conj)
        ctxt_enc_i = mult_by_monomial(cc, ctxt_enc_i, 3 * slots)
        parts = [cc.ModReduce(ctxt_enc), cc.ModReduce(ctxt_enc_i)]

    # ---- EvalMod ----
    out_parts = []
    for part in parts:
        y = cc.EvalChebyshevSeries(part, p.cheb_coeffs, -1.0, 1.0)
        if y.noise_deg > 1:
            y = cc.ModReduce(y)
        out_parts.append(apply_double_angle(cc, y, p.r_iters))
    if p.sparse:
        ctxt_mod = out_parts[0]
    else:
        ctxt_mod = cc.EvalAdd(out_parts[0],
                              mult_by_monomial(cc, out_parts[1], slots))

    # ---- boosts (no trailing S2C: output is already in slot form) ----
    if p.boost1 > 1:
        ctxt_mod = mult_by_integer(cc, ctxt_mod, p.boost1)
    if p.boost2 > 1:
        ctxt_mod = mult_by_integer(cc, ctxt_mod, p.boost2)
    return ctxt_mod.replace(slots=ct.slots)


def _eval_bootstrap_two_rounds(cc, ct: Ciphertext, precision: int
                               ) -> Ciphertext:
    """Iterative (Meta-BTS) 2-round bootstrap (reference EvalBootstrap
    numIterations=2, ckksrns-fhe.cpp:465-512): bootstrap once, scale the
    residual error up by 2^precision, bootstrap the error, subtract the
    refined error estimate. Gains ~precision bits over one round when the
    base bootstrap error is noise-dominated; at 28-bit single-word chains
    the systematic EvalMod error limits the benefit (composite scaling
    restores it).
    """
    if precision == 0:
        # the error magnitude e1*2^p must stay inside the sine's accurate
        # range (|2^p * e1| < 1); callers usually pass the measured
        # single-round precision
        precision = 3
    pow2 = 1 << precision

    if ct.noise_deg > 1:
        ct = cc.ModReduce(ct)

    # round 1 (reference ckksrns-fhe.cpp:465-512, steps numbered there)
    ct1 = eval_bootstrap(cc, ct, 1)                    # step 3
    if ct1.noise_deg > 1:
        ct1 = cc.ModReduce(ct1)

    if ct.level <= ct1.level:
        # input had at least as many towers as one bootstrap provides;
        # nothing to refine (reference :477-479)
        return ct

    # steps 2/4: scale BOTH up by 2^p as raw integer multiplies (message
    # scaled, ciphertext scale labels unchanged)
    ct1_up = mult_by_integer(cc, ct1, pow2)
    ct_up = mult_by_integer(cc, ct, pow2)

    # steps 5-7: bring the bootstrapped result down to the input's level
    # and subtract — EvalSub's flexible adjustment aligns the per-level
    # scale factors, leaving 2^p * e1
    ct1_down = cc.LevelReduce(ct1_up, ct.level - ct1_up.level)
    e_up = cc.EvalSub(ct1_down, ct_up)

    # step 8: bootstrap the error
    err_boot = eval_bootstrap(cc, e_up, 1)
    if err_boot.noise_deg > 1:
        err_boot = cc.ModReduce(err_boot)

    # steps 9-10: refine and divide by 2^p with a proper scalar multiply
    out = cc.EvalSub(ct1_up, err_boot)
    return cc.EvalMult(out, 1.0 / pow2)
