"""EvalFBT: vectorized functional bootstrapping on CKKS.

Reference analog: /root/reference src/pke/lib/scheme/ckksrns/ckksrns-fhe.cpp
(EvalFBTSetup :2945, EvalMVBPrecompute :3008-3280, EvalFBT, EvalHomDecoding
:2964) building on the RLWE schemelet (schemelet/rlwe-mp.cpp) — homomorphic
evaluation of an arbitrary look-up table over Z_p digits packed in the
coefficients of an RLWE ciphertext, thousands of slots per bootstrap.

Method (matching the reference's complex-exponential pipeline):
  1. the schemelet ciphertext (digits m_k at scale q0/p) converts to a CKKS
     ciphertext on the last level and is modulus-raised: z = m*q0/p + q0*I;
  2. CoeffsToSlots moves coefficients into slots, normalized to
     y = z/(K*q0) in [-1,1];
  3. a Chebyshev seed of exp(2*pi*i*K*y/4) plus two squarings yields
     E = exp(2*pi*i*z/q0) = omega_p^m EXACTLY modulo the q0*I overflow (the
     exponential's periodicity absorbs I, so no correction factor and no
     sine linearization error — the FBT advantage);
  4. the LUT f: Z_p -> Z evaluates as its inverse-DFT Fourier series
     sum_j c_j E^j (exact interpolation over Z_p);
  5. EvalHomDecoding (SlotsToCoeffs) returns to coefficient packing for
     conversion back through the schemelet.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from openfhe_tpu.pke.ciphertext import Ciphertext
from openfhe_tpu.pke.fhe import ckks_bootstrap as bt


def eval_fbt_setup(cc, num_slots: int = 0, p_in: int = 8,
                   correction_factor: int = 0) -> None:
    """(reference EvalFBTSetup): reuse the bootstrap C2S/S2C precompute;
    the exponential seed is interpolated here."""
    slots = num_slots or cc.ring_dim // 2
    bt.eval_bootstrap_setup(cc, slots=slots,
                            correction_factor=correction_factor or 4)
    p = cc._boot_precom[slots]
    k_bound = p.k_bound

    def f(y):
        return np.exp(2j * np.pi * (k_bound * np.asarray(y)) / 4.0)

    deg = 16
    while deg < 4096:
        c = np.polynomial.chebyshev.Chebyshev.interpolate(f, deg)
        if np.abs(c.coef[-4:]).max() < 1e-13:
            break
        deg *= 2
    coeffs = list(c.coef)
    while len(coeffs) > 8 and abs(coeffs[-1]) < 1e-14:
        coeffs.pop()
    coeffs[0] *= 2.0
    p.exp_coeffs = coeffs


def eval_fbt_keygen(cc, sk, slots: int = 0) -> None:
    bt.eval_bootstrap_keygen(cc, sk, slots)


def _eval_powers(cc, e: Ciphertext, upto: int) -> dict:
    """E^1..E^upto with log-depth binary products (reference EvalPowers)."""
    pows = {1: e}
    for j in range(2, upto + 1):
        half = j // 2
        if j % 2 == 0:
            pows[j] = cc.EvalMult(pows[half], pows[half])
        else:
            pows[j] = cc.EvalMult(pows[half + 1], pows[half])
    return pows


class SeriesPowers:
    """Shared exponential powers (reference seriesPowers<Element>,
    cryptocontext.h:2716): the expensive raise + C2S + exponential +
    power-basis work of a functional bootstrap, reusable across many LUTs
    (EvalMVB)."""

    def __init__(self, parts_pows, sparse, slots, orig_slots, p_in):
        self.parts_pows = parts_pows   # per part: dict j -> E^j ciphertext
        self.sparse = sparse
        self.slots = slots
        self.orig_slots = orig_slots
        self.p_in = p_in


def eval_mvb_precompute(cc, ct: Ciphertext, p_in: int) -> SeriesPowers:
    """(reference EvalMVBPrecompute, ckksrns-fhe.cpp:3008) raise + C2S +
    exact complex exponential + its powers, shared by every LUT."""
    p = cc._boot_precom[ct.slots]
    if not hasattr(p, "exp_coeffs"):
        raise ValueError("call EvalFBTSetup before EvalFBT/EvalMVB")
    n = cc.ring_dim
    slots = p.slots
    k_chain = len(cc.moduli_q)
    q0 = cc.moduli_q[0]
    orig_slots = ct.slots

    # ---- raise (no correction: the exponential is exact over q0*I) ----
    if ct.noise_deg > 1:
        ct = cc.ModReduce(ct)
    size = cc.size_ql(ct.level)
    if size > 1:
        ct = cc.LevelReduce(ct, k_chain - 1 - ct.level)
    sigma_in = ct.scale                       # = q0 / p_in (tracked)
    raised = bt.mod_raise(cc, ct)

    raised = cc._scalar_mult_raw(raised, sigma_in / (float(n) * float(q0)),
                                 cc.scf_real[0] ** 2 / raised.scale)
    if p.sparse:
        j = slots
        while j < n // 2:
            raised = cc.EvalAdd(raised, cc.EvalRotate(raised, j))
            j <<= 1
    raised = cc.ModReduce(raised)

    # ---- CoeffsToSlots ----
    ctxt_enc = bt.eval_linear_transform(cc, raised, p.c2s_diags, p.bstep_enc,
                                        p.pt_slots)
    conj = cc.EvalConjugate(ctxt_enc)
    if p.sparse:
        ctxt_enc = cc.EvalAdd(ctxt_enc, conj)
        ctxt_enc = cc.ModReduce(ctxt_enc)
        parts = [ctxt_enc]
    else:
        ctxt_enc_i = cc.EvalSub(ctxt_enc, conj)
        ctxt_enc = cc.EvalAdd(ctxt_enc, conj)
        ctxt_enc_i = bt.mult_by_monomial(cc, ctxt_enc_i, 3 * slots)
        parts = [cc.ModReduce(ctxt_enc), cc.ModReduce(ctxt_enc_i)]

    parts_pows = []
    for part in parts:
        e = cc.EvalChebyshevSeries(part, p.exp_coeffs, -1.0, 1.0)
        if e.noise_deg > 1:
            e = cc.ModReduce(e)
        for _ in range(2):                    # exp(t/4) -> exp(t)
            e = cc.EvalMult(e, e)
        parts_pows.append(_eval_powers(cc, e, p_in - 1))
    return SeriesPowers(parts_pows, p.sparse, slots, orig_slots, p_in)


def eval_mvb(cc, powers: SeriesPowers, lut, p_in: int,
             decode: bool = True, p_out: int = 0) -> Ciphertext:
    """(reference EvalMVB) apply one LUT's Fourier series to precomputed
    exponential powers; `decode` runs EvalHomDecoding afterwards."""
    lut = np.asarray(lut, np.float64)
    if len(lut) != p_in or p_in != powers.p_in:
        raise ValueError("lut must have p_in entries matching the "
                         "precompute")
    # E = exp(+2 pi i m / p), so f(m) = sum_j c_j E^j with
    # c_j = (1/p) sum_m f(m) exp(-2 pi i j m / p) = FFT(f)/p
    fourier = np.fft.fft(lut) / p_in

    outs = []
    for pows in powers.parts_pows:
        acc = None
        for j in range(1, p_in):
            cj = fourier[j]
            if abs(cj) < 1e-14:
                continue
            term = cc.EvalMult(pows[j], complex(cj))
            acc = term if acc is None else cc.EvalAdd(acc, term)
        acc = cc.EvalAdd(acc, complex(fourier[0])) if acc is not None \
            else cc.EvalAdd(cc.EvalMult(pows[1], 0.0), complex(fourier[0]))
        outs.append(acc)

    if powers.sparse:
        ctxt_val = outs[0]
    else:
        enc_i = bt.mult_by_monomial(cc, outs[1], powers.slots)
        ctxt_val = cc.EvalAdd(outs[0], enc_i)

    if not decode:
        return ctxt_val.replace(slots=powers.orig_slots)
    return eval_hom_decoding(cc, ctxt_val, p_out or p_in,
                             powers.orig_slots)


def eval_hom_decoding(cc, ctxt_val: Ciphertext, p_out: int,
                      orig_slots: int | None = None) -> Ciphertext:
    """(reference EvalHomDecoding, ckksrns-fhe.cpp:2964) SlotsToCoeffs +
    exact integer postScaling back to the schemelet's Q_level/p_out
    coefficient encoding."""
    p = cc._boot_precom[orig_slots or ctxt_val.slots]
    slots = p.slots
    k_chain = len(cc.moduli_q)
    q0 = cc.moduli_q[0]
    if ctxt_val.noise_deg > 1:
        ctxt_val = cc.ModReduce(ctxt_val)
    ctxt_dec = bt.eval_linear_transform(cc, ctxt_val, p.s2c_diags,
                                        p.bstep_dec, p.pt_slots)
    ctxt_dec = cc.ModReduce(ctxt_dec)
    if p.sparse:
        ctxt_dec = cc.EvalAdd(ctxt_dec, cc.EvalRotate(ctxt_dec, slots))
    # S2C diagonals carry the standard bootstrap dec_scale; undo it so the
    # output's tracked scale reflects the true values
    ctxt_dec = ctxt_dec.replace(scale=ctxt_dec.scale / (
        p.boost1 * p.boost2 * math.pow(2.0, -p.correction)
        * cc.scf_real[k_chain - 1] / float(q0)))
    # postScaling: lift coefficients to Q_level/p_out with one exact
    # integer multiply
    q_level = 1
    for q in cc.moduli_q[:cc.size_ql(ctxt_dec.level)]:
        q_level *= q
    post = q_level // max(1, int(round(p_out * ctxt_dec.scale)))
    if post > 1:
        ctxt_dec = bt.mult_by_integer(cc, ctxt_dec, post)
        ctxt_dec = ctxt_dec.replace(scale=ctxt_dec.scale * post)
    if orig_slots:
        ctxt_dec = ctxt_dec.replace(slots=orig_slots)
    return ctxt_dec


def eval_fbt(cc, ct: Ciphertext, lut, p_in: int,
             decode: bool = True, p_out: int = 0) -> Ciphertext:
    """Evaluate `lut` (a table over Z_{p_in}) on every packed digit.

    ct: CKKS ciphertext whose coefficients hold digits at scale q0/p_in
    (from SchemeletRLWEMP.convert_rlwe_to_ckks at the last level).
    Returns slots (decode=False) or coefficients (decode=True) holding
    lut[m_k].  One-LUT convenience over eval_mvb_precompute + eval_mvb.
    """
    powers = eval_mvb_precompute(cc, ct, p_in)
    return eval_mvb(cc, powers, lut, p_in, decode, p_out)
