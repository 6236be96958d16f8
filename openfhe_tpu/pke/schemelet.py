"""SchemeletRLWEMP: coefficient-encoded additive RLWE for EvalFBT.

Reference analog: /root/reference src/pke/lib/schemelet/rlwe-mp.cpp
(EncryptCoeff :132, DecryptCoeff :203, ModSwitch :252, ConvertRLWEToCKKS
:259, ConvertCKKSToRLWE :282, GetQPrime :305) — an additive-BFV "schemelet"
whose ciphertexts live as big-integer coefficient polys mod an arbitrary Q,
the bridge between CKKS ciphertexts and the vectorized functional
bootstrapping pipeline (EvalFBT/EvalMVB).

TPU-first note: these are data-boundary operations (once per FBT call, not
per slot-op); they run host-side with exact Python-int arithmetic through
the CRT interpolation in math/crt, mirroring how the reference routes them
through the BigInteger Poly type rather than the RNS hot path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from openfhe_tpu.math import crt, sampling
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from openfhe_tpu.pke.ciphertext import Ciphertext


def _bit_reverse(vals):
    n = len(vals)
    out = list(vals)
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j >= bit:
            j -= bit
            bit >>= 1
        j += bit
        if i < j:
            out[i], out[j] = out[j], out[i]
    return out


def _bit_reverse_two_halves(vals):
    n = len(vals) // 2
    return (_bit_reverse(vals[:n]) + _bit_reverse(vals[n:]))


def _switch_centered(vals, q_to: int, q_from: int):
    """Centered exact modulus switch: round(center(v) * q_to / q_from)
    mod q_to (the reference's SwitchModulus + MultiplyAndRound pair on
    big-integer Polys, rlwe-mp.cpp ModSwitchUp/Down)."""
    half_from = q_from >> 1
    out = np.empty(len(vals), object)
    for i, v in enumerate(vals):
        c = int(v)
        if c > half_from:
            c -= q_from
        r = (2 * c * q_to + q_from) // (2 * q_from)
        out[i] = r % q_to
    return out


def _center(vals, q: int):
    half = q >> 1
    return np.array([int(v) - q if int(v) > half else int(v)
                     for v in vals], object)


class SchemeletRLWEMP:
    """(reference SchemeletRLWEMP, schemelet/rlwe-mp.h:45)"""

    @staticmethod
    def get_q_prime(cc, level: int = 0) -> int:
        """Product of the first (len - level) CKKS moduli."""
        size = len(cc.moduli_q) - level
        q = 1
        for m in cc.moduli_q[:size]:
            q *= m
        return q

    @staticmethod
    def encrypt_coeff(cc, sk, values, big_q: int, p: int,
                      level: int = 0, bit_reverse: bool = False):
        """RLWE encryption of integer coefficients at scale Q/p, returned
        as a pair of python-int coefficient arrays mod big_q
        (reference EncryptCoeff :132)."""
        size = len(cc.moduli_q) - level
        basis = cc.basis_q.slice(0, size)
        n = cc.ring_dim
        k1, k2 = (cc.next_rng(), cc.next_rng())
        a = sampling.uniform_residues(k1, basis)
        e = sampling.to_residues(sampling.discrete_gaussian(k2, (n,)), basis)
        e = ntt_fwd(e, basis)
        from openfhe_tpu.math import modops as mo
        s = sk.s_qp[:size]
        b = mo.sub_mod(e, mo.mul_mod(a, s, basis.q, basis.r32, basis.r32_sh,
                                     basis.m32), basis.q)
        a_c = np.asarray(ntt_inv(a, basis))
        b_c = np.asarray(ntt_inv(b, basis))
        q_prime = basis.big_modulus()
        a_big, _ = crt.interpolate(a_c, basis.moduli)
        b_big, _ = crt.interpolate(b_c, basis.moduli)
        if big_q != q_prime:
            a_big = _switch_centered(a_big, big_q, q_prime)
            b_big = _switch_centered(b_big, big_q, q_prime)
        # embed message at stride gap with Q/p scaling
        vals = [int(v) for v in values]
        gap = n // (2 * len(vals))
        if bit_reverse:
            vals = _bit_reverse_two_halves(vals) if gap == 0 \
                else _bit_reverse(vals)
        gap = max(gap, 1)
        delta = big_q // p
        limit = min(len(vals), n)
        for i in range(limit):
            entry = vals[i] % big_q
            b_big[i * gap] = (int(b_big[i * gap]) + delta * entry) % big_q
            if gap > 1:
                b_big[(i + limit) * gap] = (int(b_big[(i + limit) * gap])
                                            + delta * entry) % big_q
        return [b_big, a_big]

    @staticmethod
    def decrypt_coeff(cc, sk, ct_polys, big_q: int, p: int,
                      level: int = 0, num_slots: int = 0, length: int = 0,
                      bit_reverse: bool = False):
        """(reference DecryptCoeff :203)"""
        size = len(cc.moduli_q) - level
        basis = cc.basis_q.slice(0, size)
        n = cc.ring_dim
        q_prime = basis.big_modulus()
        b_big, a_big = ct_polys
        b_r = _switch_centered(b_big, q_prime, big_q)
        a_r = _switch_centered(a_big, q_prime, big_q)
        a_res = crt.to_residues_host(a_r, tuple(basis.moduli))
        b_res = crt.to_residues_host(b_r, tuple(basis.moduli))
        from openfhe_tpu.math import modops as mo
        a_e = ntt_fwd(jnp.asarray(a_res), basis)
        s = sk.s_qp[:size]
        m_e = mo.add_mod(jnp.asarray(ntt_fwd(jnp.asarray(b_res), basis)),
                         mo.mul_mod(a_e, s, basis.q, basis.r32,
                                    basis.r32_sh, basis.m32), basis.q)
        m_c = np.asarray(ntt_inv(m_e, basis))
        m_big, _ = crt.interpolate(m_c, basis.moduli)
        if big_q != q_prime:
            m_big = _switch_centered(m_big, big_q, q_prime)
        m_p = _switch_centered(m_big, p, big_q)
        num_slots = num_slots or n // 2
        gap = n // (2 * num_slots)
        length = length or num_slots
        half = p >> 1
        out = []
        for i in range(length):
            v = int(m_p[i * gap])
            out.append(v - p if v > half else v)
        if bit_reverse:
            out = _bit_reverse_two_halves(out) if num_slots < length \
                else _bit_reverse(out)
        return np.array(out, np.int64)

    @staticmethod
    def mod_switch(ct_polys, q_to: int, q_from: int):
        """(reference ModSwitch :252)"""
        return [_switch_centered(ct_polys[0], q_to, q_from),
                _switch_centered(ct_polys[1], q_to, q_from)]

    @staticmethod
    def convert_rlwe_to_ckks(cc, ct_polys, big_q: int, slots: int,
                             level: int = 0, scale: float | None = None
                             ) -> Ciphertext:
        """Reinterpret an RLWE coefficient pair as a CKKS ciphertext at
        `level` (reference ConvertRLWEToCKKS :259)."""
        size = len(cc.moduli_q) - level
        basis = cc.basis_q.slice(0, size)
        q_prime = basis.big_modulus()
        b_r = _switch_centered(ct_polys[0], q_prime, big_q)
        a_r = _switch_centered(ct_polys[1], q_prime, big_q)
        b = ntt_fwd(jnp.asarray(crt.to_residues_host(
            b_r, tuple(basis.moduli))), basis)
        a = ntt_fwd(jnp.asarray(crt.to_residues_host(
            a_r, tuple(basis.moduli))), basis)
        return Ciphertext(elements=(b, a), level=level, noise_deg=1,
                          scale=scale or cc.scale_at(level), slots=slots,
                          key_tag="schemelet")

    @staticmethod
    def convert_ckks_to_rlwe(cc, ct: Ciphertext, big_q: int):
        """(reference ConvertCKKSToRLWE :282)"""
        size = cc.size_ql(ct.level)
        basis = cc.basis_at(ct.level)
        q_prime = basis.big_modulus()
        b_c = np.asarray(ntt_inv(ct.elements[0], basis))
        a_c = np.asarray(ntt_inv(ct.elements[1], basis))
        b_big, _ = crt.interpolate(b_c, basis.moduli)
        a_big, _ = crt.interpolate(a_c, basis.moduli)
        b_out = _switch_centered(b_big, big_q, q_prime)
        a_out = _switch_centered(a_big, big_q, q_prime)
        return [b_out, a_out]
