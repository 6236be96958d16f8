"""Composite-Q RGSW/GINX accumulator for parameter sets whose ring
modulus exceeds 32-bit device words (STD192-class: Q up to ~2^39).

Reference analog: the same rgsw-acc-cggi.cpp blind rotation, which the
reference runs on NATIVE_SIZE=64 words (src/binfhe/lib/binfhecontext.cpp
paramset table rows with 34-39 modulus bits).

TPU-first design: instead of emulating 64-bit words lane-wise, the ring
lives in a 2-tower RNS basis Q = q1*q2 (each < 2^31, NTT-friendly) — all
ring arithmetic stays native uint32 per tower, exactly like the pke
module's DCRT layer. The only place the INTEGER value of a coefficient
is needed is the signed gadget decomposition; it reconstructs via Garner
(x = x1 + q1*t, one 32x32->64 multiply as a (hi, lo) pair) and extracts
balanced base-2^g digits with pair shifts. Q being composite (vs the
reference's prime Q) does not affect RLWE security or gadget algebra.

Accumulator tensors carry a tower axis: acc [..., 2, N]; RGSW keys
[n, 2, d2, 2tow, 2, N] style layouts mirror rgsw.py with one extra
tower axis before the (a,b) pair.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from openfhe_tpu.lattice.basis import Basis, make_basis, _bitrev_indices
from openfhe_tpu.math import modops as mo
from openfhe_tpu.math import nbtheory
from openfhe_tpu.math import sampling
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv


@struct.dataclass
class RGSWWideParams:
    """RGSW parameters over a 2-tower composite modulus Q = q1*q2."""
    basis: Basis                  # [2] towers at ring dim N
    psi_pow: jnp.ndarray          # [2, 2N] per-tower psi powers
    eval_exp: jnp.ndarray         # [N] slot exponents (shared)
    q1_m32_q2: jnp.ndarray        # floor(2^32/q2) for x1 mod q2
    inv_q1_q2: jnp.ndarray        # q1^{-1} mod q2 (Shoup pair, [ ]/[ ])
    inv_q1_q2_sh: jnp.ndarray
    n_lwe: int = struct.field(pytree_node=False, default=0)
    q_lwe: int = struct.field(pytree_node=False, default=0)
    big_q: int = struct.field(pytree_node=False, default=0)
    base_g: int = struct.field(pytree_node=False, default=0)
    digits_g: int = struct.field(pytree_node=False, default=0)

    @property
    def ring_dim(self) -> int:
        return self.basis.ring_dim

    @property
    def digits_g2(self) -> int:
        return 2 * (self.digits_g - 1)


def make_rgsw_wide_params(n_lwe: int, ring_dim: int, q_bits: int,
                          q_lwe: int, base_g: int) -> RGSWWideParams:
    """Pick Q = q1*q2 with ~q_bits total bits, both NTT-friendly."""
    hi_bits = (q_bits + 1) // 2
    lo_bits = q_bits - hi_bits
    q1 = nbtheory.previous_prime(1 << (hi_bits + 1), 2 * ring_dim)
    q2 = nbtheory.previous_prime(1 << lo_bits, 2 * ring_dim)
    if q2 == q1:
        q2 = nbtheory.previous_prime(q2, 2 * ring_dim)
    big_q = q1 * q2
    basis = make_basis([q1, q2], ring_dim)
    digits_g = int(math.ceil(math.log(big_q) / math.log(base_g)))
    # balanced digits need B^d >= 2Q: values within (B/2)*B^(d-1) of
    # +-Q/2 otherwise overflow the signed representation (the residual
    # after d shifts must vanish for every |x| <= Q/2)
    if base_g ** digits_g < 2 * big_q:
        digits_g += 1
    rev = _bitrev_indices(ring_dim)
    pows = np.ones((2, 2 * ring_dim), np.uint64)
    for t, q in enumerate((q1, q2)):
        psi = int(np.asarray(basis.psi_br)[t, rev[1]]) if ring_dim > 1 else 1
        for i in range(1, 2 * ring_dim):
            pows[t, i] = pows[t, i - 1] * psi % q
    eval_exp = (2 * rev.astype(np.int64) + 1) % (2 * ring_dim)
    inv = pow(q1 % q2, -1, q2)
    return RGSWWideParams(
        basis=basis,
        psi_pow=jnp.asarray(pows.astype(np.uint32)),
        eval_exp=jnp.asarray(eval_exp.astype(np.int32)),
        q1_m32_q2=jnp.uint32((1 << 32) // q2),
        inv_q1_q2=jnp.uint32(inv),
        inv_q1_q2_sh=jnp.uint32((inv << 32) // q2),
        n_lwe=n_lwe, q_lwe=q_lwe, big_q=big_q,
        base_g=base_g, digits_g=digits_g)


# ---------------------------------------------------------------------------
# 64-bit pair helpers (Garner reconstruction + digit extraction)
# ---------------------------------------------------------------------------

def garner_pair(params: RGSWWideParams, x_res):
    """RNS residues [..., 2, N] -> (hi, lo) uint32 pair of x in [0, Q)."""
    b = params.basis
    q1 = b.q[0]
    q2 = b.q[1]
    x1 = x_res[..., 0, :]
    x2 = x_res[..., 1, :]
    x1m = mo.barrett_u32(x1, q2, params.q1_m32_q2)
    t = mo.mul_mod_shoup(mo.sub_mod(x2, x1m, q2), params.inv_q1_q2,
                         params.inv_q1_q2_sh, q2)
    hi, lo = mo.umul32_hilo(jnp.broadcast_to(q1, t.shape), t)
    lo2 = lo + x1
    hi = hi + (lo2 < lo).astype(jnp.uint32)
    return hi, lo2


def signed_digits_pair(params: RGSWWideParams, hi, lo, drop_first=True):
    """Balanced base-2^g digits of the centered value behind (hi, lo).

    Returns [ndig] list of int32 arrays (digit j of x after centering to
    (-Q/2, Q/2]); approximate decomposition drops digit 0 like
    rgsw.signed_digit_decompose (rgsw-acc.cpp)."""
    g = int(math.log2(params.base_g))
    big_b = params.base_g
    half_b = big_b >> 1
    q_half = params.big_q >> 1
    qh = jnp.uint32(params.big_q >> 32)
    ql = jnp.uint32(params.big_q & 0xFFFFFFFF)
    hh = jnp.uint32(q_half >> 32)
    hl = jnp.uint32(q_half & 0xFFFFFFFF)
    ge = (hi > hh) | ((hi == hh) & (lo >= hl))
    borrow = (lo < ql).astype(jnp.uint32)
    lo_c = jnp.where(ge, lo - ql, lo)
    hi_c = jnp.where(ge, hi - qh - borrow, hi)

    out = []
    rng = range(params.digits_g if not drop_first else params.digits_g)
    for j in rng:
        d = (lo_c & jnp.uint32(big_b - 1)).astype(jnp.int32)
        r = jnp.where(d >= half_b, d - big_b, d)
        if not (drop_first and j == 0):
            out.append(r)
        rr = r.astype(jnp.uint32)
        lo2 = lo_c - rr
        bw = (lo_c < rr).astype(jnp.uint32)
        rhi = jnp.where(r < 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        hi2 = hi_c - rhi - bw
        lo_c = (lo2 >> g) | (hi2 << (32 - g))
        hi_c = (hi2.astype(jnp.int32) >> g).astype(jnp.uint32)
    return out


def digits_to_residues(params: RGSWWideParams, digits):
    """[list of int32 [..., N]] -> [..., ndig, 2, N] uint32 residues."""
    q = params.basis.q                          # [2, 1]
    rows = []
    for r in digits:
        rr = r[..., None, :]                    # [..., 1, N]
        rows.append(jnp.where(rr < 0, rr + q.astype(jnp.int32), rr)
                    .astype(jnp.uint32))
    return jnp.stack(rows, axis=-3)             # [..., ndig, 2, N]


def signed_digit_decompose_wide(params: RGSWWideParams, c0, c1):
    """(c0, c1) [..., 2, N] residues -> [..., d2, 2, N]: interleaved
    (even rows from c0, odd from c1), first digit dropped."""
    h0, l0 = garner_pair(params, c0)
    h1, l1 = garner_pair(params, c1)
    d0 = signed_digits_pair(params, h0, l0)
    d1 = signed_digits_pair(params, h1, l1)
    inter = []
    for a, b_ in zip(d0, d1):
        inter.extend((a, b_))
    return digits_to_residues(params, inter)


# ---------------------------------------------------------------------------
# ring helpers (tower-aware)
# ---------------------------------------------------------------------------

def _mm(params, x, y):
    b = params.basis
    return mo.mul_mod(x, y, b.q, b.r32, b.r32_sh, b.m32)


def monomial_eval_wide(params: RGSWWideParams, t) -> jnp.ndarray:
    """EVAL-domain X^t per tower: [..., 2, N]."""
    two_n = 2 * params.ring_dim
    t = jnp.asarray(t, jnp.uint32)
    exps = (t[..., None] * params.eval_exp.astype(jnp.uint32)) \
        % jnp.uint32(two_n)                            # [..., N]
    return jnp.stack(
        [jnp.take(params.psi_pow[i], exps, axis=0) for i in range(2)],
        axis=-2)                                       # [..., 2, N]


def _tree_sum_digits(x, q):
    """Modular sum over the digit axis of x [..., d2, 2, N] (q [2, 1])."""
    while x.shape[-3] > 1:
        m = x.shape[-3]
        if m % 2:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-3] + (1,) + x.shape[-2:],
                              x.dtype)], axis=-3)
            m += 1
        x = mo.add_mod(x[..., : m // 2, :, :], x[..., m // 2:, :, :], q)
    return x[..., 0, :, :]


def keygen_cggi_pair_wide(key, params: RGSWWideParams, sk_n_eval,
                          s_lwe, std: float = 3.19) -> jnp.ndarray:
    """CGGI bootstrapping key: [n, 2, d2, 2tow, 2, N] uint32 EVAL
    (coordinate, CMUX key, gadget row, tower, (a,b), slots)."""
    b = params.basis
    n, big_n = params.n_lwe, params.ring_dim
    d2 = params.digits_g2
    k1, k2 = jax.random.split(key)
    a = sampling.uniform_residues(k1, b, lead_shape=(n, 2, d2))  # [n,2,d2,2,N]
    e = sampling.discrete_gaussian(k2, (n, 2, d2, big_n), std)
    e_res = sampling.to_residues(e, b)                           # [n,2,d2,2,N]
    a_eval = ntt_fwd(a, b)
    e_eval = ntt_fwd(e_res, b)
    b_eval = mo.add_mod(e_eval, _mm(params, a_eval, sk_n_eval), b.q)

    mbits = jnp.stack([(s_lwe == 1), (s_lwe == -1)], axis=1)     # [n, 2]
    gpow = np.zeros((d2, 2, 1), np.uint64)
    for r in range(d2):
        v = pow(params.base_g, (r // 2) + 1, params.big_q)
        for t, q in enumerate((int(b.moduli[0]), int(b.moduli[1]))):
            gpow[r, t, 0] = v % q
    gpow = jnp.asarray(gpow.astype(np.uint32))
    add = jnp.where(mbits[:, :, None, None, None],
                    gpow[None, None], jnp.uint32(0))             # [n,2,d2,2,1]
    even = (jnp.arange(d2) % 2 == 0)[None, None, :, None, None]
    a_out = mo.add_mod(a_eval, jnp.where(even, add, 0), b.q)
    b_out = mo.add_mod(b_eval, jnp.where(even, jnp.uint32(0), add), b.q)
    return jnp.stack([a_out, b_out], axis=-3)      # [n,2,d2,2tow?,...]


def eval_acc_cggi_wide(params: RGSWWideParams, bskey, acc0, acc1, a_lwe):
    """GINX blind rotation over the composite-Q ring.

    acc0/acc1 [..., 2, N] EVAL; a_lwe [..., n]; bskey
    [n, 2, d2, 2, 2tow, N] from keygen (axis -3 is the (a,b) pair)."""
    b = params.basis
    two_n = 2 * params.ring_dim
    m_by_mod = two_n // params.q_lwe

    idx = ((jnp.uint32(params.q_lwe) - a_lwe) % jnp.uint32(params.q_lwe)
           ) * jnp.uint32(m_by_mod)
    idx = jnp.moveaxis(idx, -1, 0)

    def step(carry, xs):
        c0, c1 = carry
        ek, ix = xs                            # ek [2, d2, 2pair, 2tow, N]
        p0 = ntt_inv(c0, b)
        p1 = ntt_inv(c1, b)
        dct = signed_digit_decompose_wide(params, p0, p1)  # [..., d2, 2, N]
        dct = ntt_fwd(dct, b)
        mono_p = monomial_eval_wide(params, ix)
        mono_n = monomial_eval_wide(params, (two_n - ix) % two_n)
        out0, out1 = c0, c1
        for k, mono in ((0, mono_p), (1, mono_n)):
            t0 = _tree_sum_digits(_mm(params, dct, ek[k, :, 0]), b.q)
            t1 = _tree_sum_digits(_mm(params, dct, ek[k, :, 1]), b.q)
            out0 = mo.add_mod(out0, mo.sub_mod(_mm(params, t0, mono), t0,
                                               b.q), b.q)
            out1 = mo.add_mod(out1, mo.sub_mod(_mm(params, t1, mono), t1,
                                               b.q), b.q)
        return (out0, out1), None

    (acc0, acc1), _ = jax.lax.scan(step, (acc0, acc1), (bskey, idx))
    return acc0, acc1
