"""DCRT (double-CRT / RNS) polynomial ops on `[..., k, N]` uint32 tensors.

TPU-native replacement for the reference's `DCRTPolyImpl` (/root/reference
src/core/include/lattice/hal/default/dcrtpoly.h,
dcrtpoly-impl.h — the central data type of the pke module).

Design: a DCRT polynomial is a plain uint32 tensor with the tower axis
second-to-last — *data, not objects*. All ops are pure functions over
(tensor, Basis) pairs; the reference's 53 per-tower OpenMP loops become
whole-tensor VPU ops that XLA fuses, and the tower axis is the natural
sharding axis on a TPU mesh (see parallel/).

Format convention: COEFF = natural-order coefficients; EVAL = negacyclic
NTT values in bit-reversed order (slot j holds a(psi^(2*brv(j)+1))).
Format is tracked by the thin `Poly` wrapper (static aux field), mirroring
the reference's Format enum without virtual dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from openfhe_tpu.lattice.basis import Basis
from openfhe_tpu.math import modops as mo
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv

COEFF = 0
EVAL = 1


@struct.dataclass
class Poly:
    """A DCRT ring element: residues `data[..., k, N]` + static format flag."""
    data: jnp.ndarray
    fmt: int = struct.field(pytree_node=False, default=EVAL)

    @property
    def k(self) -> int:
        return self.data.shape[-2]


# ---------------------------------------------------------------------------
# elementwise ring ops (any format, both operands same format)
# ---------------------------------------------------------------------------

def add(a: Poly, b: Poly, basis: Basis) -> Poly:
    assert a.fmt == b.fmt
    return Poly(mo.add_mod(a.data, b.data, basis.q), a.fmt)


def sub(a: Poly, b: Poly, basis: Basis) -> Poly:
    assert a.fmt == b.fmt
    return Poly(mo.sub_mod(a.data, b.data, basis.q), a.fmt)


def neg(a: Poly, basis: Basis) -> Poly:
    return Poly(mo.neg_mod(a.data, basis.q), a.fmt)


def mul(a: Poly, b: Poly, basis: Basis) -> Poly:
    """Pointwise product — ring multiplication requires EVAL format."""
    assert a.fmt == EVAL and b.fmt == EVAL
    return Poly(mo.mul_mod(a.data, b.data, basis.q, basis.r32,
                           basis.r32_sh, basis.m32), EVAL)


def mul_scalar_shoup(a: Poly, c, c_sh, basis: Basis) -> Poly:
    """Multiply by a per-tower constant with precomputed Shoup companions."""
    return Poly(mo.mul_mod_shoup(a.data, c, c_sh, basis.q), a.fmt)


# ---------------------------------------------------------------------------
# format conversion
# ---------------------------------------------------------------------------

def to_eval(a: Poly, basis: Basis) -> Poly:
    if a.fmt == EVAL:
        return a
    return Poly(ntt_fwd(a.data, basis), EVAL)


def to_coeff(a: Poly, basis: Basis) -> Poly:
    if a.fmt == COEFF:
        return a
    return Poly(ntt_inv(a.data, basis), COEFF)


# ---------------------------------------------------------------------------
# automorphism (reference: DCRTPolyInterface::AutomorphismTransform,
# dcrtpoly-interface.h:492-502) — precomputed gather tables, see automorph.py
# ---------------------------------------------------------------------------

def automorphism_eval(a: Poly, eval_idx) -> Poly:
    """Apply sigma_g in EVAL format: pure slot permutation."""
    assert a.fmt == EVAL
    return Poly(jnp.take(a.data, eval_idx, axis=-1), EVAL)


def automorphism_coeff(a: Poly, coeff_idx, coeff_neg_mask, basis: Basis) -> Poly:
    """Apply sigma_g in COEFF format: signed permutation of coefficients."""
    assert a.fmt == COEFF
    g = jnp.take(a.data, coeff_idx, axis=-1)
    return Poly(jnp.where(coeff_neg_mask, mo.neg_mod(g, basis.q), g), COEFF)
