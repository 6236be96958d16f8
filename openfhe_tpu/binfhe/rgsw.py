"""RGSW crypto params, gadget decomposition, and the CGGI/GINX accumulator.

Reference analog: /root/reference src/binfhe/lib/rgsw-cryptoparameters.cpp
(gadget powers, monomial tables, gate constants), rgsw-acc.cpp
(SignedDigitDecompose), rgsw-acc-cggi.cpp (KeyGenAcc/KeyGenCGGI :74,
AddToAccCGGI :104, EvalAcc :61).

TPU-first design:
  * The RGSW bootstrapping key is one tensor [n, 2, digitsG2, 2, N] (per LWE
    coordinate, two ternary-CMUX keys, gadget rows, (a,b) pair, EVAL domain).
  * Blind rotation is a lax.scan over the n LWE coordinates (inherently
    sequential); each step is fully tensorized: digitsG2 batched NTTs, the
    external products as an elementwise multiply + tree-sum over the digit
    axis, and the X^idx - 1 monomial as a closed-form gather from the psi
    power table (EVAL slot j of X^t is psi^(t * e_j), e_j = 2*brv(j)+1).
  * Batched over many gates: all steps broadcast over a leading batch axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from openfhe_tpu.lattice.basis import Basis, make_basis, _bitrev_indices
from openfhe_tpu.math import modops as mo
from openfhe_tpu.math import sampling
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv


@struct.dataclass
class RGSWParams:
    """RingGSW parameters + device tables for one (N, Q, baseG)."""
    basis: Basis                      # single-tower basis for Q at ring dim N
    psi_pow: jnp.ndarray              # [2N] powers of psi (for monomials)
    eval_exp: jnp.ndarray             # [N] exponent e_j of slot j
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
        # approximate gadget decomposition drops the first digit
        return 2 * (self.digits_g - 1)


def make_rgsw_params(n_lwe: int, ring_dim: int, big_q: int, q_lwe: int,
                     base_g: int) -> RGSWParams:
    basis = make_basis([big_q], ring_dim)
    digits_g = int(math.ceil(math.log(big_q) / math.log(base_g)))
    # psi power table and the EVAL slot exponents (ops/ntt.py layout)
    psi = int(np.asarray(basis.psi_br)[0, _bitrev_indices(ring_dim)[1]]) \
        if ring_dim > 1 else 1
    # psi_br[0, j] = psi^brv(j); brv-index 1 holds psi^1
    pows = np.ones(2 * ring_dim, np.uint64)
    for i in range(1, 2 * ring_dim):
        pows[i] = pows[i - 1] * psi % big_q
    rev = _bitrev_indices(ring_dim)
    eval_exp = (2 * rev.astype(np.int64) + 1) % (2 * ring_dim)
    return RGSWParams(basis=basis,
                      psi_pow=jnp.asarray(pows.astype(np.uint32)),
                      eval_exp=jnp.asarray(eval_exp.astype(np.int32)),
                      n_lwe=n_lwe, q_lwe=q_lwe, big_q=big_q,
                      base_g=base_g, digits_g=digits_g)


def monomial_eval(params: RGSWParams, t) -> jnp.ndarray:
    """EVAL-domain values of X^t: slot j holds psi^(t * e_j).

    t may be a traced scalar or batched [...]; returns [..., N].
    """
    two_n = 2 * params.ring_dim
    t = jnp.asarray(t, jnp.uint32)
    exps = (t[..., None] * params.eval_exp.astype(jnp.uint32)) \
        % jnp.uint32(two_n)
    return jnp.take(params.psi_pow, exps, axis=0)


def signed_digit_decompose(params: RGSWParams, c0: jnp.ndarray,
                           c1: jnp.ndarray) -> jnp.ndarray:
    """Balanced base-2^g digits of (c0, c1), first digit dropped
    (rgsw-acc.cpp SignedDigitDecompose). Input [..., N] uint32 mod Q;
    output [..., digitsG2, N] uint32 (even rows from c0, odd from c1)."""
    q = params.big_q
    g_bits = int(math.log2(params.base_g))
    half = jnp.uint32(q >> 1)

    def centered(t):
        return (t.astype(jnp.int32)
                - jnp.where(t >= half, jnp.int32(q), jnp.int32(0)))

    def digit(d):
        r = (d << (32 - g_bits)) >> (32 - g_bits)     # sign-extended low bits
        return r, (d - r) >> g_bits

    d0, d1 = centered(c0), centered(c1)
    _, d0 = digit(d0)     # drop first digit (approximate decomposition)
    _, d1 = digit(d1)
    rows = []
    for _ in range(params.digits_g - 1):
        r0, d0 = digit(d0)
        r1, d1 = digit(d1)
        rows.append(jnp.where(r0 < 0, r0 + q, r0).astype(jnp.uint32))
        rows.append(jnp.where(r1 < 0, r1 + q, r1).astype(jnp.uint32))
    return jnp.stack(rows, axis=-2)


def keygen_cggi_pair(key, params: RGSWParams, sk_n_eval: jnp.ndarray,
                     s_lwe: jnp.ndarray, std: float = 3.19) -> jnp.ndarray:
    """CGGI bootstrapping key for all n LWE coordinates at once
    (rgsw-acc-cggi.cpp KeyGenAcc :40 + KeyGenCGGI :74).

    Returns [n, 2, digitsG2, 2, N] uint32 EVAL: for coordinate i, key 0
    encrypts [s_i == 1], key 1 encrypts [s_i == -1].
    """
    b = params.basis
    n, big_n = params.n_lwe, params.ring_dim
    d2 = params.digits_g2
    q = params.big_q
    k1, k2 = jax.random.split(key)
    a = sampling.uniform_residues(
        k1, b, lead_shape=(n, 2, d2))[..., 0, :]          # [n,2,d2,N] COEFF
    e = sampling.discrete_gaussian(k2, (n, 2, d2, big_n), std)
    e = jnp.asarray(e % q, jnp.uint32)

    a_eval = ntt_fwd(a[..., None, :], b)[..., 0, :]
    e_eval = ntt_fwd(e[..., None, :], b)[..., 0, :]
    mm = lambda x, y: mo.mul_mod(x[..., None, :], y, b.q, b.r32, b.r32_sh,
                                 b.m32)[..., 0, :]
    b_eval = mo.add_mod(e_eval, mm(a_eval, sk_n_eval), jnp.uint32(q))

    # message bits per (coordinate, key): m[i,0] = [s_i==1], m[i,1] = [s_i==-1]
    mbits = jnp.stack([(s_lwe == 1), (s_lwe == -1)], axis=1)  # [n, 2] bool
    # gadget constants: row r adds Gpow[(r>>1)+1] = B^(r//2+1) to the
    # a-part (even r) or b-part (odd r) — constant polynomial = all-slots
    gpow = np.zeros(d2, np.uint32)
    for r in range(d2):
        gpow[r] = pow(params.base_g, (r // 2) + 1, q)
    gpow = jnp.asarray(gpow)
    add = jnp.where(mbits[:, :, None, None], gpow[None, None, :, None],
                    jnp.uint32(0))                           # [n,2,d2,1]
    even = (jnp.arange(d2) % 2 == 0)[None, None, :, None]
    a_out = mo.add_mod(a_eval, jnp.where(even, add, 0), jnp.uint32(q))
    b_out = mo.add_mod(b_eval, jnp.where(even, jnp.uint32(0), add),
                       jnp.uint32(q))
    return jnp.stack([a_out, b_out], axis=-2)                # [n,2,d2,2,N]


def eval_acc_cggi(params: RGSWParams, bskey: jnp.ndarray, acc0, acc1,
                  a_lwe: jnp.ndarray):
    """GINX blind rotation (rgsw-acc-cggi.cpp EvalAcc :61 + AddToAccCGGI).

    acc0/acc1: [..., N] uint32 EVAL. a_lwe: [..., n] mod q. Sequential scan
    over the n coordinates; each step fully tensorized and batch-friendly.
    """
    b = params.basis
    q = params.big_q
    two_n = 2 * params.ring_dim
    m_by_mod = two_n // params.q_lwe
    qq = jnp.uint32(q)
    mm = lambda x, y: mo.mul_mod(x, y, b.q[0], b.r32[0], b.r32_sh[0],
                                 b.m32[0])

    # idx_i = (q - a_i) * (2N/q) in [0, 2N)
    idx = ((jnp.uint32(params.q_lwe) - a_lwe) % jnp.uint32(params.q_lwe)
           ) * jnp.uint32(m_by_mod)
    idx = jnp.moveaxis(idx, -1, 0)                           # [n, ...]

    def step(carry, xs):
        c0, c1 = carry
        ek, ix = xs                                          # ek [2,d2,2,N]
        p0 = ntt_inv(c0[..., None, :], b)[..., 0, :]
        p1 = ntt_inv(c1[..., None, :], b)[..., 0, :]
        dct = signed_digit_decompose(params, p0, p1)         # [..., d2, N]
        # batch the digit axis over the (single-tower) NTT
        dct = ntt_fwd(dct[..., :, None, :], b)[..., :, 0, :]
        # external products with both CMUX keys; monomials X^ix - 1, X^-ix - 1
        mono_p = monomial_eval(params, ix)
        mono_n = monomial_eval(params, (two_n - ix) % two_n)
        out0, out1 = c0, c1
        for k, mono in ((0, mono_p), (1, mono_n)):
            t0 = lwe_tree_sum(mm(dct, ek[k, :, 0, :]), qq)   # sum over d2
            t1 = lwe_tree_sum(mm(dct, ek[k, :, 1, :]), qq)
            # acc += t * (X^m - 1) = t*mono - t
            out0 = mo.add_mod(out0, mo.sub_mod(mm(t0, mono), t0, qq), qq)
            out1 = mo.add_mod(out1, mo.sub_mod(mm(t1, mono), t1, qq), qq)
        return (out0, out1), None

    (acc0, acc1), _ = jax.lax.scan(step, (acc0, acc1), (bskey, idx))
    return acc0, acc1


def lwe_tree_sum(x: jnp.ndarray, q, axis: int = -2) -> jnp.ndarray:
    """Overflow-safe modular sum along `axis` (digit-axis reductions)."""
    x = jnp.moveaxis(x, axis, -1)
    while x.shape[-1] > 1:
        m = x.shape[-1]
        if m % 2:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (1,), x.dtype)], axis=-1)
            m += 1
        x = mo.add_mod(x[..., : m // 2], x[..., m // 2:], q)
    return x[..., 0]
