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


def signed_digit_decompose_one(params: RGSWParams, c: jnp.ndarray,
                               ) -> jnp.ndarray:
    """Single-poly variant (digitsG-1 rows; rgsw-acc.cpp second overload)."""
    q = params.big_q
    g_bits = int(math.log2(params.base_g))
    half = jnp.uint32(q >> 1)
    d = (c.astype(jnp.int32)
         - jnp.where(c >= half, jnp.int32(q), jnp.int32(0)))
    r = (d << (32 - g_bits)) >> (32 - g_bits)
    d = (d - r) >> g_bits
    rows = []
    for _ in range(params.digits_g - 1):
        r = (d << (32 - g_bits)) >> (32 - g_bits)
        d = (d - r) >> g_bits
        rows.append(jnp.where(r < 0, r + q, r).astype(jnp.uint32))
    return jnp.stack(rows, axis=-2)


def keygen_rgsw_monomial(key, params: RGSWParams, sk_n_eval: jnp.ndarray,
                         ms, std: float = 3.19) -> jnp.ndarray:
    """RGSW encryptions of X^(m * 2N/q) for a list of integer messages
    (rgsw-acc-dm.cpp KeyGenDM :81 / rgsw-acc-lmkcdey.cpp KeyGenLMKCDEY).

    ms: host ints (may be negative). Returns [len(ms), d2, 2, N] EVAL.
    """
    b = params.basis
    big_n, q_lwe, q = params.ring_dim, params.q_lwe, params.big_q
    d2 = params.digits_g2
    cnt = len(ms)
    k1, k2 = jax.random.split(key)
    a = sampling.uniform_residues(k1, b, lead_shape=(cnt, d2))[..., 0, :]
    e = jnp.asarray(
        sampling.discrete_gaussian(k2, (cnt, d2, big_n), std) % q
    ).astype(jnp.uint32)
    a_eval = ntt_fwd(a[..., None, :], b)[..., 0, :]
    e_eval = ntt_fwd(e[..., None, :], b)[..., 0, :]
    mm_ = lambda x, y: mo.mul_mod(x[..., None, :], y, b.q, b.r32, b.r32_sh,
                                  b.m32)[..., 0, :]
    b_eval = mo.add_mod(e_eval, mm_(a_eval, sk_n_eval), jnp.uint32(q))

    # message monomials +-X^mm in EVAL, per key
    factor = (2 * big_n) // q_lwe
    exps, signs = [], []
    for m in ms:
        mm = ((int(m) % q_lwe) + q_lwe) % q_lwe * factor
        sign = 1
        if mm >= big_n:
            mm -= big_n
            sign = -1
        exps.append(mm)
        signs.append(sign)
    mono = monomial_eval(params, jnp.asarray(exps, jnp.uint32))  # [cnt, N]
    sgn = jnp.asarray(signs, jnp.int32)[:, None]
    gpow = np.zeros(d2, np.uint32)
    for r in range(d2):
        gpow[r] = pow(params.base_g, (r // 2) + 1, q)
    add = mo.mul_mod(mono[:, None, :],
                     jnp.asarray(gpow)[None, :, None].astype(jnp.uint32),
                     b.q[0], b.r32[0], b.r32_sh[0], b.m32[0])   # [cnt,d2,N]
    add = jnp.where(sgn[:, :, None] > 0, add,
                    mo.neg_mod(add, jnp.uint32(q)))
    even = (jnp.arange(d2) % 2 == 0)[None, :, None]
    a_out = mo.add_mod(a_eval, jnp.where(even, add, 0), jnp.uint32(q))
    b_out = mo.add_mod(b_eval, jnp.where(even, jnp.uint32(0), add),
                       jnp.uint32(q))
    return jnp.stack([a_out, b_out], axis=-2)    # [cnt, d2, 2, N]


def external_product_replace(params: RGSWParams, key_rows: jnp.ndarray,
                             acc0, acc1):
    """acc <- ExternalProduct(acc, RGSW) (rgsw-acc-dm.cpp AddToAccDM)."""
    b = params.basis
    q = jnp.uint32(params.big_q)
    mm_ = lambda x, y: mo.mul_mod(x, y, b.q[0], b.r32[0], b.r32_sh[0],
                                  b.m32[0])
    p0 = ntt_inv(acc0[..., None, :], b)[..., 0, :]
    p1 = ntt_inv(acc1[..., None, :], b)[..., 0, :]
    dct = signed_digit_decompose(params, p0, p1)
    dct = ntt_fwd(dct[..., :, None, :], b)[..., :, 0, :]
    out0 = lwe_tree_sum(mm_(dct, key_rows[..., :, 0, :]), q)
    out1 = lwe_tree_sum(mm_(dct, key_rows[..., :, 1, :]), q)
    return out0, out1


# ---------------------------------------------------------------------------
# DM / AP accumulator (rgsw-acc-dm.cpp)
# ---------------------------------------------------------------------------

def keygen_dm(key, params: RGSWParams, sk_n_eval: jnp.ndarray,
              s_lwe, base_r: int, std: float = 3.19):
    """AP bootstrapping key [n, digitsR, baseR, d2, 2, N]: RGSW(X^(s_i j
    R^k)) for every digit value j (including j=0, the identity monomial, so
    the accumulation loop is branch-free on TPU)."""
    q_lwe = params.q_lwe
    digits_r = int(math.ceil(math.log(q_lwe) / math.log(base_r)))
    n = params.n_lwe
    s_host = np.asarray(s_lwe, np.int64)
    size = n * digits_r * base_r * params.digits_g2 * 2 * params.ring_dim * 4
    if size > (12 << 30):
        # the key itself would not fit HBM — not a chunking problem
        raise ValueError("AP key exceeds device memory for this parameter "
                         "set; use GINX")
    ms = []
    for i in range(n):
        for k in range(digits_r):
            for j in range(base_r):
                ms.append(int(s_host[i]) * j * (base_r ** k))
    # chunked generation: keygen temporaries (a/e samples + their NTTs)
    # are ~3x the key slice, so bound each slice to ~256 MB
    per_row = params.digits_g2 * 2 * params.ring_dim * 4
    chunk = max(1, (256 << 20) // per_row)
    parts = []
    for lo in range(0, len(ms), chunk):
        key, sub = jax.random.split(key)
        parts.append(keygen_rgsw_monomial(sub, params, sk_n_eval,
                                          ms[lo:lo + chunk], std))
    ek = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return ek.reshape(n, digits_r, base_r, params.digits_g2, 2,
                      params.ring_dim), digits_r


def eval_acc_dm(params: RGSWParams, bskey, digits_r: int, base_r: int,
                acc0, acc1, a_lwe: jnp.ndarray):
    """AP blind rotation: scan over (i, digit) with gathered keys."""
    q_lwe = params.q_lwe
    ai = (jnp.uint32(q_lwe) - a_lwe) % jnp.uint32(q_lwe)    # [..., n]
    digs = []
    t = ai
    for _ in range(digits_r):
        digs.append(t % base_r)
        t = t // base_r
    digits = jnp.stack(digs, axis=-1)              # [..., n, digitsR]
    n = params.n_lwe
    flat = jnp.moveaxis(digits.reshape(digits.shape[:-2] + (-1,)), -1, 0)
    keys = bskey.reshape((n * digits_r,) + bskey.shape[2:])

    def step(carry, xs):
        c0, c1 = carry
        krows_all, dig = xs                        # [baseR, d2, 2, N]
        krows = jnp.take(krows_all, dig, axis=0)   # [..., d2, 2, N]
        return external_product_replace(params, krows, c0, c1), None

    (acc0, acc1), _ = jax.lax.scan(step, (acc0, acc1), (keys, flat))
    return acc0, acc1


# ---------------------------------------------------------------------------
# LMKCDEY accumulator (rgsw-acc-lmkcdey.cpp) — host-scheduled automorphisms
# ---------------------------------------------------------------------------

def keygen_auto(key, params: RGSWParams, sk_n_eval: jnp.ndarray, g: int,
                std: float = 3.19):
    """Automorphism switching key s(X^g) -> s, digitsG-1 rows
    (KeyGenAuto :201)."""
    from openfhe_tpu.lattice.automorph import eval_indices
    b = params.basis
    big_n, q = params.ring_dim, params.big_q
    dg = params.digits_g - 1
    idx = jnp.asarray(eval_indices(big_n, g % (2 * big_n)))
    sk_auto = jnp.take(sk_n_eval, idx, axis=-1)
    k1, k2 = jax.random.split(key)
    a = sampling.uniform_residues(k1, b, lead_shape=(dg,))[..., 0, :]
    e = ntt_fwd(sampling.to_residues(
        sampling.discrete_gaussian(k2, (dg, big_n), std),
        b)[:, 0][:, None, :], b)[:, 0, :]
    mm_ = lambda x, y: mo.mul_mod(x, y, b.q[0], b.r32[0], b.r32_sh[0],
                                  b.m32[0])
    gpow = jnp.asarray(np.array(
        [pow(params.base_g, r + 1, q) for r in range(dg)],
        np.uint32))[:, None]
    k1v = mo.add_mod(mo.sub_mod(e, mm_(jnp.broadcast_to(
        sk_auto, (dg, big_n)), gpow.astype(jnp.uint32)), jnp.uint32(q)),
        mm_(a, sk_n_eval), jnp.uint32(q))
    return jnp.stack([a, k1v], axis=-2)            # [dg, 2, N]


def automorphism_acc(params: RGSWParams, g: int, auto_key, acc0, acc1):
    """(Automorphism :249): permute acc, keyswitch the a-component."""
    from openfhe_tpu.lattice.automorph import eval_indices
    b = params.basis
    q = jnp.uint32(params.big_q)
    big_n = params.ring_dim
    idx = jnp.asarray(eval_indices(big_n, g % (2 * big_n)))
    a_g = jnp.take(acc0, idx, axis=-1)
    b_g = jnp.take(acc1, idx, axis=-1)
    a_coeff = ntt_inv(a_g[..., None, :], b)[..., 0, :]
    dct = signed_digit_decompose_one(params, a_coeff)
    dct = ntt_fwd(dct[..., :, None, :], b)[..., :, 0, :]
    mm_ = lambda x, y: mo.mul_mod(x, y, b.q[0], b.r32[0], b.r32_sh[0],
                                  b.m32[0])
    new0 = lwe_tree_sum(mm_(dct, auto_key[..., :, 0, :]), q)
    new1 = mo.add_mod(b_g, lwe_tree_sum(mm_(dct, auto_key[..., :, 1, :]),
                                        q), q)
    return new0, new1


def make_log_gen(big_n: int):
    """Map odd v in [1, 2N) -> signed discrete log base 5 (GetLogGen):
    v = 5^i -> i; v = -5^i -> -i (i>0); v = 2N-1 (-1) -> sentinel 2N."""
    m = 2 * big_n
    table = {}
    cur = 1
    for i in range(big_n // 2):
        table[cur] = i if i else 0
        table[(m - cur) % m] = -i if i else m    # -1 -> sentinel M
        cur = cur * 5 % m
    return table


def build_lmkcdey_schedule(params: RGSWParams, a_vec: np.ndarray,
                           num_auto_keys: int) -> np.ndarray:
    """Fixed-op-format LMKCDEY schedule for one public a-vector.

    The automorphism/external-product order is a pure function of the
    public a vector (rgsw-acc-lmkcdey.cpp EvalAcc :61-144), so it is
    precomputed here as an [L, 5] int32 tensor of uniform steps and the
    whole blind rotation runs as ONE compiled lax.scan
    (eval_acc_lmkcdey_scan) — this is what makes LMKCDEY gates batchable
    and TPU-fast (round-4 verdict task 4; the reference's host loop has
    no analog).

    Step fields: (perm_sel, key_sel, pass0, use_sum, add_b) with
      perm_sel: row of lmkcdey_perm_table (0 identity, 1..w g=5^k,
                w+1 conjugation g=2N-5)
      key_sel : row of lmkcdey_key_bank (0 zero, 1..n RGSW(X^{s_j m}),
                n+1+k automorphism key k)
      new0 = pass0 ? perm(acc0) : sum_r NTT(digits)_r * key[r,0]
      new1 = (use_sum ? sum_r NTT(digits)_r * key[r,1] : 0)
             + (add_b ? perm(acc1) : 0)
    EP steps: (0, 1+j, 0, 1, 0); AUTO steps: (k, n+1+k, 0, 1, 1);
    the initial conjugation-permute: (w+1, 0, 1, 0, 1).
    """
    big_n = params.ring_dim
    m = 2 * big_n
    nh = big_n // 2
    n = params.n_lwe
    log_gen = make_log_gen(big_n)
    permute: dict = {}
    for i, ai in enumerate(np.asarray(a_vec, np.int64)):
        v = ((m - int(ai)) % m) | 0x1
        permute.setdefault(log_gen[v % m], []).append(i)

    ops = []

    def ep(j):
        ops.append((0, 1 + j, 0, 1, 0))

    def auto(k):                     # sigma_{5^k} with auto key k
        ops.append((k, n + 1 + k, 0, 1, 1))

    def auto0():                     # sigma_{2N-5} with auto key 0
        ops.append((num_auto_keys + 1, n + 1 + 0, 0, 1, 1))

    # initial conjugation permute of the accumulator (acc0 is zero at
    # entry, so permuting both components matches the reference's
    # acc1-only AutomorphismTransform)
    ops.append((num_auto_keys + 1, 0, 1, 0, 1))
    n_skips = 0
    for i in range(nh - 1, 0, -1):
        if -i in permute:
            if n_skips:
                auto(n_skips)
                n_skips = 0
            for j in permute[-i]:
                ep(j)
        n_skips += 1
        if n_skips == num_auto_keys or i == 1:
            auto(n_skips)
            n_skips = 0
    if m in permute:
        for j in permute[m]:
            ep(j)
    auto0()
    for i in range(nh - 1, 0, -1):
        if i in permute:
            if n_skips:
                auto(n_skips)
                n_skips = 0
            for j in permute[i]:
                ep(j)
        n_skips += 1
        if n_skips == num_auto_keys or i == 1:
            auto(n_skips)
            n_skips = 0
    if 0 in permute:
        for j in permute[0]:
            ep(j)
    return np.asarray(ops, np.int32)


LMK_NOOP = np.array([0, 0, 1, 0, 1], np.int32)    # identity schedule step


def lmkcdey_perm_table(params: RGSWParams, num_auto_keys: int) -> np.ndarray:
    """[w+2, N] EVAL gather rows: 0 identity, k=1..w sigma_{5^k},
    w+1 sigma_{2N-5}."""
    from openfhe_tpu.lattice.automorph import eval_indices
    big_n = params.ring_dim
    m = 2 * big_n
    rows = [np.arange(big_n, dtype=np.int32)]
    for k in range(1, num_auto_keys + 1):
        rows.append(eval_indices(big_n, pow(5, k, m)))
    rows.append(eval_indices(big_n, (m - 5) % m))
    return np.stack(rows)


def lmkcdey_key_bank(params: RGSWParams, rgsw_keys, auto_keys: dict,
                     num_auto_keys: int) -> jnp.ndarray:
    """[1+n+w+1, d2, 2, N] unified key bank: row 0 zero (no-op), rows
    1..n the RGSW keys, rows n+1+k the automorphism keys with their
    digitsG-1 rows placed at EVEN unified rows (a-component digits) and
    zero odd rows — so one masked step form serves both op kinds."""
    d2 = params.digits_g2
    n, big_n = params.n_lwe, params.ring_dim
    w = num_auto_keys
    auto_stack = jnp.stack([auto_keys[k] for k in range(w + 1)])
    padded = jnp.zeros((w + 1, d2, 2, big_n), jnp.uint32)
    padded = padded.at[:, 0::2].set(auto_stack)
    zero = jnp.zeros((1, d2, 2, big_n), jnp.uint32)
    return jnp.concatenate([zero, rgsw_keys, padded], axis=0)


def eval_acc_lmkcdey_scan(params: RGSWParams, key_bank, perm_table,
                          sched, acc0, acc1):
    """LMKCDEY blind rotation as ONE lax.scan over uniform masked steps.

    sched: [L, ..., 5] int32 (leading batch dims of acc broadcast; each
    gate carries its own padded schedule). See build_lmkcdey_schedule.
    """
    b = params.basis
    q = jnp.uint32(params.big_q)
    mm_ = lambda x, y: mo.mul_mod(x, y, b.q[0], b.r32[0], b.r32_sh[0],
                                  b.m32[0])

    def step(carry, xs):
        c0, c1 = carry
        perm_sel, key_sel, pass0, use_sum, add_b = (
            xs[..., i] for i in range(5))
        perm = jnp.take(perm_table, perm_sel, axis=0)        # [..., N]
        key = jnp.take(key_bank, key_sel, axis=0)            # [..., d2,2,N]
        a_g = jnp.take_along_axis(jnp.broadcast_to(c0, perm.shape), perm,
                                  axis=-1)
        b_g = jnp.take_along_axis(jnp.broadcast_to(c1, perm.shape), perm,
                                  axis=-1)
        p0 = ntt_inv(a_g[..., None, :], b)[..., 0, :]
        p1 = ntt_inv(b_g[..., None, :], b)[..., 0, :]
        dct = signed_digit_decompose(params, p0, p1)         # [..., d2, N]
        dct = ntt_fwd(dct[..., :, None, :], b)[..., :, 0, :]
        s0 = lwe_tree_sum(mm_(dct, key[..., :, 0, :]), q)
        s1 = lwe_tree_sum(mm_(dct, key[..., :, 1, :]), q)
        new0 = jnp.where((pass0 > 0)[..., None], a_g, s0)
        s1m = jnp.where((use_sum > 0)[..., None], s1, jnp.uint32(0))
        bgm = jnp.where((add_b > 0)[..., None], b_g, jnp.uint32(0))
        new1 = mo.add_mod(s1m, bgm, q)
        return (new0, new1), None

    (acc0, acc1), _ = jax.lax.scan(step, (acc0, acc1), sched)
    return acc0, acc1


def eval_acc_lmkcdey(params: RGSWParams, rgsw_keys, auto_keys: dict,
                     num_auto_keys: int, acc0, acc1, a_vec: np.ndarray):
    """LMKCDEY blind rotation for ONE ciphertext (host-scheduled — the
    automorphism schedule depends on the public a vector; EvalAcc :68)."""
    big_n = params.ring_dim
    m = 2 * big_n
    nh = big_n // 2
    log_gen = make_log_gen(big_n)
    permute: dict = {}
    for i, ai in enumerate(np.asarray(a_vec, np.int64)):
        # automorphism index w = (2N - a_i) | 1, UNSCALED (reference
        # rgsw-acc-lmkcdey.cpp EvalAcc :82): the 2N/q scaling enters via
        # the key monomials X^{s_i * 2N/q}, so the conjugated exponent is
        # s_i*(2N/q)*w = -s_i*a_i*(2N/q) + on-grid rounding error; scaling
        # w as well would square the factor (wrong whenever q != 2N).
        v = ((m - int(ai)) % m) | 0x1
        idx = log_gen[v % m]
        permute.setdefault(idx, []).append(i)

    from openfhe_tpu.lattice.automorph import eval_indices
    gen = 5
    n_skips = 0
    # reference applies AutomorphismTransform(M - gen) to acc[1] only
    acc1 = jnp.take(acc1, jnp.asarray(eval_indices(big_n, (m - gen) % m)),
                    axis=-1)
    for i in range(nh - 1, 0, -1):
        if -i in permute:
            if n_skips:
                g = pow(gen, n_skips, m)
                acc0, acc1 = automorphism_acc(params, g,
                                              auto_keys[n_skips],
                                              acc0, acc1)
                n_skips = 0
            for j in permute[-i]:
                acc0, acc1 = external_product_replace(
                    params, rgsw_keys[j], acc0, acc1)
        n_skips += 1
        if n_skips == num_auto_keys or i == 1:
            g = pow(gen, n_skips, m)
            acc0, acc1 = automorphism_acc(params, g, auto_keys[n_skips],
                                          acc0, acc1)
            n_skips = 0
    if m in permute:
        for j in permute[m]:
            acc0, acc1 = external_product_replace(params, rgsw_keys[j],
                                                  acc0, acc1)
    acc0, acc1 = automorphism_acc(params, (m - gen) % m, auto_keys[0],
                                  acc0, acc1)
    for i in range(nh - 1, 0, -1):
        if i in permute:
            if n_skips:
                g = pow(gen, n_skips, m)
                acc0, acc1 = automorphism_acc(params, g,
                                              auto_keys[n_skips],
                                              acc0, acc1)
                n_skips = 0
            for j in permute[i]:
                acc0, acc1 = external_product_replace(params, rgsw_keys[j],
                                                      acc0, acc1)
        n_skips += 1
        if n_skips == num_auto_keys or i == 1:
            g = pow(gen, n_skips, m)
            acc0, acc1 = automorphism_acc(params, g, auto_keys[n_skips],
                                          acc0, acc1)
            n_skips = 0
    if 0 in permute:
        for j in permute[0]:
            acc0, acc1 = external_product_replace(params, rgsw_keys[j],
                                                  acc0, acc1)
    return acc0, acc1
