"""LWE scheme: keygen, encryption, modulus/key switching.

Reference analog: /root/reference src/binfhe/lib/lwe-pke.cpp (KeyGen :48,
PubKeyGen :75, Encrypt :101, Decrypt, ModSwitch :242 RoundqQ, KeySwitchGen
:252, KeySwitch :323, SwitchCTtoqn :153, NoiselessEmbedding :349).

TPU-first design: LWE ciphertexts are batched uint32 tensors ([..., n] for a,
[...] for b) so gate evaluation amortizes across many ciphertexts. Ternary
secrets make a*s a signed selective sum — a masked tree reduction, no wide
multiplies. Mod-switch rounding needs a 42-bit product so it runs on host
numpy int64 at the (cheap) gate boundary; a device kernel lands with the
pallas pass.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from openfhe_tpu.math import modops as mo
from openfhe_tpu.math import sampling


@struct.dataclass
class LWECiphertext:
    a: jnp.ndarray                  # [..., n] uint32
    b: jnp.ndarray                  # [...] uint32
    modulus: int = struct.field(pytree_node=False, default=0)
    pt_modulus: int = struct.field(pytree_node=False, default=4)


@struct.dataclass
class LWEPrivateKey:
    s: jnp.ndarray                  # [n] int32 in {-1, 0, 1} (or small gauss)


@struct.dataclass
class LWEPublicKey:
    A: jnp.ndarray                  # [N, N] uint32 mod Q
    v: jnp.ndarray                  # [N] uint32: A s + e


@struct.dataclass
class LWESwitchingKey:
    """KS key: encryptions of j * B^k * sN_i under the small key.

    a: [N, baseKS, d, n] uint32, b: [N, baseKS, d] uint32, all mod qKS.
    """
    a: jnp.ndarray
    b: jnp.ndarray
    mod_ks: int = struct.field(pytree_node=False, default=0)
    base_ks: int = struct.field(pytree_node=False, default=0)


def tree_sum_mod(x: jnp.ndarray, q: int, axis: int = -1) -> jnp.ndarray:
    """Overflow-safe modular sum: pairwise add_mod tree along `axis`."""
    qq = jnp.uint32(q)
    x = jnp.moveaxis(x, axis, -1)
    while x.shape[-1] > 1:
        m = x.shape[-1]
        if m % 2:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (1,), x.dtype)], axis=-1)
            m += 1
        x = mo.add_mod(x[..., : m // 2], x[..., m // 2:], qq)
    return x[..., 0]


def _signed_dot_mod(a: jnp.ndarray, s: jnp.ndarray, q: int) -> jnp.ndarray:
    """sum_i a_i * s_i mod q for ternary s: masked tree reduction."""
    qq = jnp.uint32(q)
    term = jnp.where(s == 1, a, jnp.where(s == -1,
                                          mo.neg_mod(a, qq), jnp.uint32(0)))
    return tree_sum_mod(term, q, axis=-1)


def key_gen(key, n: int, dist: str = "ternary") -> LWEPrivateKey:
    """(lwe-pke.cpp:48) ternary (or gaussian) secret of dimension n."""
    if dist == "gaussian":
        return LWEPrivateKey(s=sampling.discrete_gaussian(key, (n,)))
    return LWEPrivateKey(s=sampling.ternary(key, (n,)))


def pub_key_gen(key, sk: LWEPrivateKey, q: int,
                std: float = 3.19) -> LWEPublicKey:
    """(lwe-pke.cpp:75 PubKeyGen) pk = (A, v = A s + e) at dimension N.

    TPU note: the reference's per-row OpenMP loop is one [N, N] signed
    matmul here."""
    n = sk.s.shape[-1]
    k1, k2 = jax.random.split(key)
    A = jax.random.randint(k1, (n, n), 0, q, dtype=jnp.uint32)
    e = sampling.discrete_gaussian(k2, (n,), std)
    v = mo.add_mod(_signed_dot_mod(A, sk.s, q),
                   jnp.asarray(e % q, jnp.uint32), jnp.uint32(q))
    return LWEPublicKey(A=A, v=v)


def key_gen_pair(key, n: int, q: int, dist: str = "ternary"):
    """(lwe-pke.cpp:62 KeyGenPair) -> (pk, skN)."""
    k1, k2 = jax.random.split(key)
    sk = key_gen(k1, n, dist)
    return pub_key_gen(k2, sk, q), sk


def encrypt_pub(key, pk: LWEPublicKey, m, q: int, p: int = 4,
                std: float = 3.19) -> LWECiphertext:
    """(lwe-pke.cpp:112 EncryptN) public-key LWE encryption at dimension N:
    a = A^T s' + e_a,  b = m*(q/p) + <v, s'> + e_b with ephemeral ternary
    s'."""
    m = jnp.asarray(m, jnp.uint32)
    n = pk.v.shape[-1]
    k1, k2, k3 = jax.random.split(key, 3)
    sp = sampling.ternary(k1, m.shape + (n,))
    e_a = sampling.discrete_gaussian(k2, m.shape + (n,), std)
    e_b = sampling.discrete_gaussian(k3, m.shape, std)
    # a_i = sum_j A[j][i] * sp_j  (+ e_a); sp broadcasts across rows i
    asp = _signed_dot_mod(jnp.swapaxes(
        jnp.broadcast_to(pk.A, m.shape + pk.A.shape), -1, -2),
        sp[..., None, :], q)
    a = mo.add_mod(asp, jnp.asarray(e_a % q, jnp.uint32), jnp.uint32(q))
    b = mo.add_mod((m % p) * jnp.uint32(q // p),
                   jnp.asarray(e_b % q, jnp.uint32), jnp.uint32(q))
    b = mo.add_mod(b, _signed_dot_mod(
        jnp.broadcast_to(pk.v, m.shape + pk.v.shape), sp, q),
        jnp.uint32(q))
    return LWECiphertext(a=a, b=b, modulus=q, pt_modulus=p)


def encrypt(key, sk: LWEPrivateKey, m, q: int, p: int = 4,
            std: float = 3.19) -> LWECiphertext:
    """b = a*s + e + m*(q/p) (lwe-pke.cpp:101). `m` may be batched."""
    m = jnp.asarray(m, jnp.uint32)
    n = sk.s.shape[-1]
    k1, k2 = jax.random.split(key)
    a = jax.random.randint(k1, m.shape + (n,), 0, q, dtype=jnp.uint32)
    e = sampling.discrete_gaussian(k2, m.shape, std)
    b = mo.add_mod((m % p) * jnp.uint32(q // p),
                   jnp.asarray(e % q, jnp.uint32), jnp.uint32(q))
    b = mo.add_mod(b, _signed_dot_mod(a, sk.s, q), jnp.uint32(q))
    return LWECiphertext(a=a, b=b, modulus=q, pt_modulus=p)


def decrypt(sk: LWEPrivateKey, ct: LWECiphertext):
    """m = round(p/q * (b - a*s)) mod p (lwe-pke.cpp Decrypt)."""
    q, p = ct.modulus, ct.pt_modulus
    r = mo.sub_mod(ct.b, _signed_dot_mod(ct.a, sk.s, q), jnp.uint32(q))
    r_host = np.asarray(r).astype(np.int64)
    return ((r_host * p + q // 2) // q) % p


def noiseless_embedding(n: int, m, q: int, p: int = 4) -> LWECiphertext:
    m = jnp.asarray(m, jnp.uint32)
    return LWECiphertext(a=jnp.zeros(m.shape + (n,), jnp.uint32),
                         b=(m % p) * jnp.uint32(q // p),
                         modulus=q, pt_modulus=p)


def eval_add(c1: LWECiphertext, c2: LWECiphertext) -> LWECiphertext:
    q = jnp.uint32(c1.modulus)
    return c1.replace(a=mo.add_mod(c1.a, c2.a, q),
                      b=mo.add_mod(c1.b, c2.b, q))


def eval_sub(c1: LWECiphertext, c2: LWECiphertext) -> LWECiphertext:
    q = jnp.uint32(c1.modulus)
    return c1.replace(a=mo.sub_mod(c1.a, c2.a, q),
                      b=mo.sub_mod(c1.b, c2.b, q))


def eval_not(ct: LWECiphertext) -> LWECiphertext:
    """(binfhe-base-scheme.cpp EvalNOT): (q/4 - b, -a)."""
    q = ct.modulus
    return ct.replace(a=mo.neg_mod(ct.a, jnp.uint32(q)),
                      b=mo.sub_mod(jnp.uint32(q // 4), ct.b, jnp.uint32(q)))


def _div_u64_by_u32(hi, lo, d: int):
    """floor((hi*2^32 + lo) / d) for uint32 pair tensors and a constant
    d < 2^31, entirely on 32-bit lanes: float32 estimate + exact pair
    correction (est error < 1 for the ~2^43 numerators of mod-switch)."""
    c_hi = np.float32((1 << 32) / d)
    c_lo = np.float32(1.0 / d)
    est = (hi.astype(jnp.float32) * c_hi
           + lo.astype(jnp.float32) * c_lo).astype(jnp.uint32)
    # r = n - est*d as a signed two's-complement pair; nudge est until
    # 0 <= r < d (the float estimate is within +-3)
    d_u = jnp.uint32(d)
    ph, pl = mo.umul32_hilo(est, d_u)
    rl = lo - pl
    rh = hi - ph - (lo < pl).astype(jnp.uint32)
    for _ in range(3):
        neg = (rh >> 31) == 1                   # r < 0: est too big
        ge = (~neg) & ((rh != 0) | (rl >= d_u))  # r >= d: est too small
        rl_a = rl + d_u
        rh_a = rh + (rl_a < rl).astype(jnp.uint32)
        rl_s = rl - d_u
        rh_s = rh - (rl < d_u).astype(jnp.uint32)
        est = jnp.where(neg, est - 1, jnp.where(ge, est + 1, est))
        rl = jnp.where(neg, rl_a, jnp.where(ge, rl_s, rl))
        rh = jnp.where(neg, rh_a, jnp.where(ge, rh_s, rh))
    return est


def mod_switch_device(q_to: int, ct: LWECiphertext) -> LWECiphertext:
    """Device-side Round(v * q_to / q_from): v*q_to as a 32-bit pair,
    constant division via float32 estimate + exact correction. Keeps the
    gate hot path free of host round trips (mod-switch runs twice per
    gate batch; the host D2H was both a throughput sink and the source
    of run-to-run gates/s variance on a degraded transfer path)."""
    q_from = int(ct.modulus)
    half = q_from >> 1

    def rq(v):
        hi, lo = mo.umul32_hilo(jnp.asarray(v, jnp.uint32),
                                jnp.uint32(q_to))
        lo2 = lo + jnp.uint32(half)
        hi = hi + (lo2 < lo).astype(jnp.uint32)
        q = _div_u64_by_u32(hi, lo2, q_from)
        return q % jnp.uint32(q_to)

    return ct.replace(a=rq(ct.a), b=rq(ct.b), modulus=q_to)


def mod_switch(q_to: int, ct: LWECiphertext) -> LWECiphertext:
    """Round(v * q_to / q_from) per entry (lwe-pke.cpp:242 RoundqQ).

    Narrow moduli (q_from < 2^31 with uint32 inputs) stay on device;
    composite-Q wide rings use exact host integers.
    """
    q_from = ct.modulus
    if (int(q_from) < (1 << 31) and int(q_to) < (1 << 31)
            and hasattr(ct.a, "dtype")
            and ct.a.dtype in (jnp.uint32, np.uint32)):
        return mod_switch_device(q_to, ct)
    # x * 2*q_to + q_from can overflow int64 for composite-Q wide rings
    # (50-bit Q x 2^18 q_ks); exact Python-int math via object dtype then
    exact = (int(q_from).bit_length() + int(q_to).bit_length() + 1) >= 62

    def rq(v):
        x = np.asarray(v)
        if exact:
            xo = x.astype(object)
            r = (xo * (2 * q_to) + q_from) // (2 * q_from) % q_to
            return jnp.asarray(r.astype(np.int64)).astype(jnp.uint32)
        x = x.astype(np.int64)
        return jnp.asarray(((x * q_to * 2 + q_from) // (2 * q_from))
                           % q_to).astype(jnp.uint32)

    return ct.replace(a=rq(ct.a), b=rq(ct.b), modulus=q_to)


def key_switch_gen(key, sk: LWEPrivateKey, sk_n: LWEPrivateKey, q_ks: int,
                   base_ks: int, std: float = 3.19) -> LWESwitchingKey:
    """(lwe-pke.cpp:252): ks[i][j][k] encrypts j * B^k * sN_i under sk."""
    big_n = sk_n.s.shape[-1]
    n = sk.s.shape[-1]
    d = int(math.ceil(math.log(q_ks) / math.log(base_ks)))
    k1, k2 = jax.random.split(key)
    a = jax.random.randint(k1, (big_n, base_ks, d, n), 0, q_ks,
                           dtype=jnp.uint32)
    e = sampling.discrete_gaussian(k2, (big_n, base_ks, d), std)
    # j * B^k mod qKS table [base_ks, d]
    jbk = np.zeros((base_ks, d), np.uint32)
    val = 1
    for kk in range(d):
        for j in range(base_ks):
            jbk[j, kk] = (j * val) % q_ks
        val = (val * base_ks) % q_ks
    jbk = jnp.asarray(jbk)
    # sN_i * (j*B^k) for ternary/small sN: masked select
    s_n = sk_n.s[:, None, None]
    qq = jnp.uint32(q_ks)
    msg = jnp.where(s_n >= 0,
                    mo.barrett_u32(jbk[None] * s_n.astype(jnp.uint32),
                                   qq, jnp.uint32((1 << 32) // q_ks)),
                    mo.neg_mod(mo.barrett_u32(
                        jbk[None] * (-s_n).astype(jnp.uint32), qq,
                        jnp.uint32((1 << 32) // q_ks)), qq))
    b = mo.add_mod(msg, jnp.asarray(e % q_ks, jnp.uint32), qq)
    # + a . s  (over the small key)
    dots = _signed_dot_mod(a, sk.s, q_ks)
    b = mo.add_mod(b, dots, qq)
    return LWESwitchingKey(a=a, b=b, mod_ks=q_ks, base_ks=base_ks)


def key_switch(ks: LWESwitchingKey, ct: LWECiphertext) -> LWECiphertext:
    """(lwe-pke.cpp:323): subtract the keyed digits of each a_i."""
    q, base = ks.mod_ks, ks.base_ks
    d = ks.a.shape[2]
    n = ks.a.shape[3]
    big_n = ks.a.shape[0]
    # digits of a: [..., N, d]
    at = ct.a.astype(jnp.uint32)
    digs = []
    for _ in range(d):
        digs.append(at % base)
        at = at // base
    digits = jnp.stack(digs, axis=-1)                     # [..., N, d]
    # gather ks rows: b_terms[..., N, d], a_terms[..., N, d, n]
    i_idx = jnp.arange(big_n)[:, None]
    k_idx = jnp.arange(d)[None, :]
    b_terms = ks.b[i_idx, digits, k_idx]
    a_terms = ks.a[i_idx, digits, k_idx]
    lead = ct.a.shape[:-1]
    b_sum = tree_sum_mod(b_terms.reshape(lead + (big_n * d,)), q)
    a_sum = tree_sum_mod(a_terms.reshape(lead + (big_n * d, n)), q, axis=-2)
    qq = jnp.uint32(q)
    return LWECiphertext(a=mo.neg_mod(a_sum, qq),
                         b=mo.sub_mod(ct.b, b_sum, qq),
                         modulus=q, pt_modulus=ct.pt_modulus)


def switch_ct_to_qn(ks: LWESwitchingKey, q: int,
                    ct: LWECiphertext) -> LWECiphertext:
    """ModSwitch(qKS) -> KeySwitch -> ModSwitch(q) (lwe-pke.cpp:153)."""
    ct_ms = mod_switch(ks.mod_ks, ct)
    ct_ks = key_switch(ks, ct_ms)
    return mod_switch(q, ct_ks)
