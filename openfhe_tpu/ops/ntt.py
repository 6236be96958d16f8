"""Batched negacyclic NTT over RNS towers.

TPU-native replacement for the reference NTT
(`NumberTheoreticTransformNat::ForwardTransformToBitReverse` /
`InverseTransformFromBitReverse`, /root/reference
src/core/include/math/hal/intnat/transformnat-impl.h:307-330): Cooley-Tukey
DIT forward / Gentleman-Sande DIF inverse with Shoup-precomputed twiddles in
bit-reversed order (Longa-Naehrig iteration).

TPU-first design notes:
  * The transform is expressed as log2(N) static reshape stages on a
    `[..., k, N]` uint32 tensor — no gathers, no dynamic shapes; XLA lowers
    each butterfly stage to fused VPU ops. Twiddles broadcast from `[k, N]`
    tables so all towers (and any leading batch axes) transform in one shot,
    replacing the reference's per-tower OpenMP loops.
  * EVAL format is stored in *bit-reversed* order (the natural output order
    of the DIT forward pass). Pointwise ops are order-agnostic; automorphisms
    precompute their permutations in this order (see lattice/automorph.py).
  * Values are canonical residues in [0, q) at every stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openfhe_tpu.lattice.basis import Basis
from openfhe_tpu.math.modops import add_mod, sub_mod, mul_mod_shoup


def ntt_fwd(x: jnp.ndarray, b: Basis) -> jnp.ndarray:
    """Negacyclic forward NTT: COEFF (natural order) -> EVAL (bit-reversed).

    x: uint32 [..., k, N] canonical residues; returns same shape/dtype.
    Dispatches to the fused single-kernel MXU path (ops/ntt_fused, moduli
    < ~2^27) or the 4-step multi-call path for large rings on TPU.
    """
    from openfhe_tpu.ops import ntt4step, ntt_fused, ntt_small
    if ntt_fused.supported(b):
        return ntt_fused.ntt_fwd_fused(x, b)
    if ntt4step.supported(b):
        return ntt4step.ntt_fwd_4step(x, b)
    if ntt_small.supported(b):
        return ntt_small.ntt_fwd_mat(x, b)
    return _ntt_fwd_vpu(x, b)


def ntt_inv(x: jnp.ndarray, b: Basis) -> jnp.ndarray:
    """Negacyclic inverse NTT: EVAL (bit-reversed) -> COEFF (natural)."""
    from openfhe_tpu.ops import ntt4step, ntt_fused, ntt_small
    if ntt_fused.supported(b):
        return ntt_fused.ntt_inv_fused(x, b)
    if ntt4step.supported(b):
        return ntt4step.ntt_inv_4step(x, b)
    if ntt_small.supported(b):
        return ntt_small.ntt_inv_mat(x, b)
    return _ntt_inv_vpu(x, b)


@jax.jit
def _ntt_fwd_vpu(x: jnp.ndarray, b: Basis) -> jnp.ndarray:
    n = b.ring_dim
    lead = x.shape[:-1]
    q = b.q.reshape(b.q.shape[:-1] + (1, 1))  # [k,1,1]
    m, t = 1, n
    while m < n:
        t //= 2
        xs = x.reshape(lead + (m, 2, t))
        s = b.psi_br[..., m:2 * m, None]       # [k, m, 1]
        s_sh = b.psi_br_sh[..., m:2 * m, None]
        u = xs[..., 0, :]
        v = mul_mod_shoup(xs[..., 1, :], s, s_sh, q)
        x = jnp.stack([add_mod(u, v, q), sub_mod(u, v, q)], axis=-2)
        x = x.reshape(lead + (n,))
        m *= 2
    return x


@jax.jit
def _ntt_inv_vpu(x: jnp.ndarray, b: Basis) -> jnp.ndarray:
    n = b.ring_dim
    lead = x.shape[:-1]
    q = b.q.reshape(b.q.shape[:-1] + (1, 1))
    m, t = n // 2, 1
    while m >= 1:
        xs = x.reshape(lead + (m, 2, t))
        s = b.ipsi_br[..., m:2 * m, None]
        s_sh = b.ipsi_br_sh[..., m:2 * m, None]
        u = xs[..., 0, :]
        v = xs[..., 1, :]
        lo = add_mod(u, v, q)
        hi = mul_mod_shoup(sub_mod(u, v, q), s, s_sh, q)
        x = jnp.stack([lo, hi], axis=-2).reshape(lead + (n,))
        m //= 2
        t *= 2
    # scale by N^{-1}
    return mul_mod_shoup(x, b.ninv, b.ninv_sh, b.q)
