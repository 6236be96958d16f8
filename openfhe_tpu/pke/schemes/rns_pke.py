"""RNS PKE core: keygen / encrypt-zero / decrypt inner products.

Reference analog: /root/reference src/pke/lib/schemebase/base-pke.cpp:47-98
(RLWE keygen b = ns*e - a*s, encrypt-zero core) and
src/pke/lib/schemerns/rns-pke.cpp. Shared by CKKS/BFV/BGV.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from openfhe_tpu.lattice.basis import Basis
from openfhe_tpu.math import modops as mo
from openfhe_tpu.math import sampling
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from openfhe_tpu.pke.keys import KeyPair, PrivateKey, PublicKey
from openfhe_tpu.pke.constants import SecretKeyDist


def keygen(rng, basis_qp: Basis, k_q: int, key_tag: str,
           secret_key_dist=SecretKeyDist.UNIFORM_TERNARY,
           sigma: float = sampling.DEFAULT_SIGMA,
           ns_int: int = 1) -> KeyPair:
    """RLWE key generation (base-pke.cpp:47-98): s small; pk=(b,a) over Q
    with b = ns*e - a*s."""
    n = basis_qp.ring_dim
    rng, k1, k2, k3 = jax.random.split(rng, 4)
    if secret_key_dist == SecretKeyDist.GAUSSIAN:
        s_small = sampling.discrete_gaussian(k1, (n,), sigma)
    elif secret_key_dist == SecretKeyDist.SPARSE_TERNARY:
        s_small = sampling.ternary(k1, (n,), hamming_weight=192)
    else:
        s_small = sampling.ternary(k1, (n,))
    s_qp = ntt_fwd(sampling.to_residues(s_small, basis_qp), basis_qp)
    sk = PrivateKey(s_qp=s_qp, key_tag=key_tag)

    # pk lives over the extended basis QP (reference: GetParamsPK(),
    # rns-cryptoparameters.h:265) so PK-based key switching (PRE) works
    a = sampling.uniform_residues(k2, basis_qp)
    e = ntt_fwd(sampling.to_residues(
        sampling.discrete_gaussian(k3, (n,), sigma), basis_qp), basis_qp)
    if ns_int != 1:
        e = _mul_const_int(e, ns_int, basis_qp)
    b = mo.sub_mod(e, mo.mul_mod(a, s_qp, basis_qp.q, basis_qp.r32,
                                 basis_qp.r32_sh, basis_qp.m32), basis_qp.q)
    return KeyPair(public_key=PublicKey(b=b, a=a, key_tag=key_tag),
                   secret_key=sk)


def _mul_const_int(x, c: int, basis: Basis):
    from openfhe_tpu.lattice import rns_tools as rt
    cc, cc_sh = rt._shoup_pair([c % q for q in basis.moduli], basis.moduli)
    return mo.mul_mod_shoup(x, cc, cc_sh, basis.q)


@functools.partial(jax.jit, static_argnames=("secret_key_dist", "ns_int"))
def encrypt_zero_pk(rng, pk: PublicKey, basis_ql: Basis,
                    secret_key_dist=SecretKeyDist.UNIFORM_TERNARY,
                    ns_int: int = 1):
    """(c0, c1) = (b*u + ns*e0, a*u + ns*e1) over Q_l, EVAL format."""
    n = basis_ql.ring_dim
    k = len(basis_ql.moduli)
    rng, k1, k2, k3 = jax.random.split(rng, 4)
    if secret_key_dist == SecretKeyDist.GAUSSIAN:
        u_small = sampling.discrete_gaussian(k1, (n,))
    else:
        u_small = sampling.ternary(k1, (n,))
    u = ntt_fwd(sampling.to_residues(u_small, basis_ql), basis_ql)
    e0 = ntt_fwd(sampling.to_residues(
        sampling.discrete_gaussian(k2, (n,)), basis_ql), basis_ql)
    e1 = ntt_fwd(sampling.to_residues(
        sampling.discrete_gaussian(k3, (n,)), basis_ql), basis_ql)
    if ns_int != 1:
        e0 = _mul_const_int(e0, ns_int, basis_ql)
        e1 = _mul_const_int(e1, ns_int, basis_ql)
    mm = lambda x, y: mo.mul_mod(x, y, basis_ql.q, basis_ql.r32,
                                 basis_ql.r32_sh, basis_ql.m32)
    c0 = mo.add_mod(mm(pk.b[:k], u), e0, basis_ql.q)
    c1 = mo.add_mod(mm(pk.a[:k], u), e1, basis_ql.q)
    return c0, c1


@functools.partial(jax.jit, static_argnames=("ns_int",))
def encrypt_zero_sk(rng, sk: PrivateKey, basis_ql: Basis,
                    ns_int: int = 1):
    """(c0, c1) = (ns*e - a*s, a) over Q_l, EVAL format."""
    n = basis_ql.ring_dim
    k = len(basis_ql.moduli)
    rng, k1, k2 = jax.random.split(rng, 3)
    a = sampling.uniform_residues(k1, basis_ql)
    e = ntt_fwd(sampling.to_residues(
        sampling.discrete_gaussian(k2, (n,)), basis_ql), basis_ql)
    if ns_int != 1:
        e = _mul_const_int(e, ns_int, basis_ql)
    c0 = mo.sub_mod(e, mo.mul_mod(a, sk.s_qp[:k], basis_ql.q, basis_ql.r32,
                                  basis_ql.r32_sh, basis_ql.m32), basis_ql.q)
    return c0, a


@jax.jit
def decrypt_core(elements, sk: PrivateKey, basis_ql: Basis) -> jnp.ndarray:
    """b = c0 + c1*s + c2*s^2 + ... -> COEFF residues [k, N]."""
    k = elements[0].shape[-2]
    s = sk.s_qp[:k]
    mm = lambda x, y: mo.mul_mod(x, y, basis_ql.q, basis_ql.r32,
                                 basis_ql.r32_sh, basis_ql.m32)
    acc = elements[0]
    s_pow = s
    for c in elements[1:]:
        acc = mo.add_mod(acc, mm(c, s_pow), basis_ql.q)
        s_pow = mm(s_pow, s)
    return ntt_inv(acc, basis_ql)
