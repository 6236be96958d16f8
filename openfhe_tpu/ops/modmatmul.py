"""Fused modular matmul on the MXU: out = (W @ X) mod q per tower.

The single hot primitive behind both the 4-step NTT (W = DFT-factor
matrices) and RNS base conversion (W = tower-conversion constants) —
reference analogs: transformnat-impl.h butterfly loops and
DCRTPolyImpl::ApproxSwitchCRTBasis (dcrtpoly-impl.h).

Strategy: W is pre-decomposed into 4 signed base-256 digit matrices (int8);
X's digits are extracted in VMEM. The 16 digit products run on the MXU with
int32 accumulation (exact: |sum| < A_max * 128 * 128 <= 2^31 for A <= 2048),
grouped by total weight; each group is Barrett-reduced and recombined with
Shoup multiplies by 2^(8*tot) — all before leaving VMEM, so HBM sees one
read of X and one write of the result.

The jnp path (same math, XLA-fused) is used on CPU and as the reference
implementation; the pallas path engages on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openfhe_tpu.math import modops as mo

NL = 4          # signed base-256 limbs cover |w| < 2^31
NTOT = 2 * NL - 1


def balanced_limbs_host(m: np.ndarray) -> np.ndarray:
    """[*dims] int -> [NL, *dims] int8 with m = sum d_i * 256^i."""
    out = np.zeros((NL,) + m.shape, np.int8)
    mm = m.astype(np.int64).copy()
    for i in range(NL):
        d = ((mm + 128) % 256) - 128
        out[i] = d.astype(np.int8)
        mm = (mm - d) >> 8
    if not np.all(mm == 0):
        raise ValueError("matrix entries exceed signed 32-bit range")
    return out


def make_mod_matmul_consts(moduli) -> dict:
    """Per-tower scalars for the kernel: q, barrett m32, 2^32 mod q, and
    the 2^(8*tot) recombination constants (+ Shoup companions)."""
    k = len(moduli)
    q = np.array(moduli, np.uint64)
    m32 = ((1 << 32) // q).astype(np.uint32)
    r32 = ((1 << 32) % q).astype(np.uint32)
    pw = np.zeros((k, NTOT), np.uint64)
    r32pw = np.zeros((k, NTOT), np.uint64)
    for t, qq in enumerate(moduli):
        for s in range(NTOT):
            pw[t, s] = pow(2, 8 * s, int(qq))
            r32pw[t, s] = (pow(2, 32 + 8 * s, int(qq)))
    pw_sh = (pw << np.uint64(32)) // q[:, None]
    return dict(
        q=jnp.asarray(q.astype(np.uint32)),
        m32=jnp.asarray(m32),
        r32=jnp.asarray(r32),
        pow=jnp.asarray(pw.astype(np.uint32)),
        pow_sh=jnp.asarray(pw_sh.astype(np.uint32)),
        r32pow=jnp.asarray(r32pw.astype(np.uint32)),
    )


def _data_limbs(x_u32):
    v = x_u32.astype(jnp.int32)
    outs = []
    for _ in range(NL):
        d = ((v + 128) & 255) - 128
        outs.append(d.astype(jnp.int8))
        v = (v - d) >> 8
    return outs


def _recombine(dots, q, pows, pow_shs, r32pows):
    """dots[l][m] int32 partials -> (sum_{l,m} dot*256^(l+m)) mod q.

    Skips Barrett: Shoup multiply handles any 32-bit operand, so we reduce
    g*2^(8*tot) directly; a signed g reinterpreted as unsigned is off by
    2^32, fixed by subtracting (2^(32+8*tot) mod q) where g < 0.
    """
    out = None
    for tot in range(NTOT):
        g = None
        for l in range(NL):
            m = tot - l
            if 0 <= m < NL:
                g = dots[l][m] if g is None else g + dots[l][m]
        neg = g < 0
        term = mo.mul_mod_shoup(g.astype(jnp.uint32), pows[tot],
                                pow_shs[tot], q)
        term = jnp.where(neg, mo.sub_mod(term, r32pows[tot], q), term)
        out = term if out is None else mo.add_mod(out, term, q)
    return out


# ---------------------------------------------------------------------------
# pallas kernel
# ---------------------------------------------------------------------------

def _mm_kernel(q_ref, pow_ref, powsh_ref, r32pow_ref,
               w_ref, x_ref, o_ref):
    """One (tower, column-tile) block: o = (W @ X) mod q."""
    t = pl.program_id(0)
    x_l = _data_limbs(x_ref[0])
    dots = [[None] * NL for _ in range(NL)]
    for l in range(NL):
        wl = w_ref[0, l]
        for m in range(NL):
            dots[l][m] = jax.lax.dot_general(
                wl, x_l[m], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    q = q_ref[t]
    pows = [pow_ref[t, s] for s in range(NTOT)]
    pow_shs = [powsh_ref[t, s] for s in range(NTOT)]
    r32pows = [r32pow_ref[t, s] for s in range(NTOT)]
    o_ref[0] = _recombine(dots, q, pows, pow_shs, r32pows)


@functools.partial(jax.jit, static_argnames=("tile_b",))
def mod_matmul_tpu(w_limbs, x, consts, tile_b: int = 512):
    """(W @ X) mod q batched over towers, on the MXU.

    w_limbs: int8 [k, NL, D, A]; x: uint32 [k, A, B]; returns [k, D, B].
    A, D multiples of 128 recommended; B a multiple of tile_b.
    """
    k, _, d_dim, a_dim = w_limbs.shape
    b_dim = x.shape[-1]
    tb = min(tile_b, b_dim)
    grid = (k, b_dim // tb)
    return pl.pallas_call(
        _mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NL, d_dim, a_dim), lambda t, j: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_dim, tb), lambda t, j: (t, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_dim, tb), lambda t, j: (t, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, d_dim, b_dim), jnp.uint32),
    )(consts["q"], consts["pow"], consts["pow_sh"], consts["r32pow"],
      w_limbs, x)


def mod_matmul_jnp(w_limbs, x, consts):
    """XLA fallback (exact, used on CPU and for verification)."""
    x_l = jnp.stack(_data_limbs(x), axis=1)               # [k, NL, A, B]
    q = consts["q"][:, None, None]
    dots = [[jax.lax.dot_general(
        w_limbs[:, l], x_l[:, m], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32) for m in range(NL)]
        for l in range(NL)]
    pows = [consts["pow"][:, t][:, None, None] for t in range(NTOT)]
    pow_shs = [consts["pow_sh"][:, t][:, None, None] for t in range(NTOT)]
    r32pows = [consts["r32pow"][:, t][:, None, None] for t in range(NTOT)]
    return _recombine(dots, q, pows, pow_shs, r32pows)


def mod_matmul(w_limbs, x, consts):
    if jax.default_backend() == "tpu":
        return mod_matmul_tpu(w_limbs, x, consts)
    return mod_matmul_jnp(w_limbs, x, consts)


# ---------------------------------------------------------------------------
# row-modulus variant: each OUTPUT row has its own modulus (RNS base
# conversion: out[j] = sum_i y[i] * C[i, j] mod d_j)
# ---------------------------------------------------------------------------

def make_rowmod_consts(out_moduli) -> dict:
    """Per-output-row constants as [D, 1] columns (VMEM-broadcastable)."""
    d = len(out_moduli)
    q = np.array(out_moduli, np.uint64)
    pw = np.zeros((NTOT, d), np.uint64)
    r32pw = np.zeros((NTOT, d), np.uint64)
    for j, qq in enumerate(out_moduli):
        for s in range(NTOT):
            pw[s, j] = pow(2, 8 * s, int(qq))
            r32pw[s, j] = pow(2, 32 + 8 * s, int(qq))
    pw_sh = (pw << np.uint64(32)) // q[None, :]
    return dict(
        q=jnp.asarray(q.astype(np.uint32).reshape(d, 1)),
        pow=jnp.asarray(pw.astype(np.uint32).reshape(NTOT, d, 1)),
        pow_sh=jnp.asarray(pw_sh.astype(np.uint32).reshape(NTOT, d, 1)),
        r32pow=jnp.asarray(r32pw.astype(np.uint32).reshape(NTOT, d, 1)),
    )


def _mm_rowmod_kernel(q_ref, pow_ref, powsh_ref, r32pow_ref,
                      w_ref, x_ref, o_ref):
    x_l = _data_limbs(x_ref[:])
    dots = [[None] * NL for _ in range(NL)]
    for l in range(NL):
        wl = w_ref[l]
        for m in range(NL):
            dots[l][m] = jax.lax.dot_general(
                wl, x_l[m], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    q = q_ref[:]                                   # [D, 1] broadcasts
    pows = [pow_ref[s] for s in range(NTOT)]
    pow_shs = [powsh_ref[s] for s in range(NTOT)]
    r32pows = [r32pow_ref[s] for s in range(NTOT)]
    o_ref[:] = _recombine(dots, q, pows, pow_shs, r32pows)


@functools.partial(jax.jit, static_argnames=("tile_b",))
def mod_matmul_rowmod_tpu(w_limbs, x, consts, tile_b: int = 2048):
    """out[j, :] = (sum_i W[i,j] x[i,:]) mod d_j.

    w_limbs: int8 [NL, D, A]; x: uint32 [A, B]; consts from
    make_rowmod_consts. Returns uint32 [D, B].
    """
    _, d_dim, a_dim = w_limbs.shape
    b_dim = x.shape[-1]
    tb = min(tile_b, b_dim)
    while b_dim % tb:
        tb -= 128
    grid = (b_dim // tb,)
    return pl.pallas_call(
        _mm_rowmod_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((a_dim, tb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_dim, tb), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_dim, b_dim), jnp.uint32),
    )(consts["q"], consts["pow"], consts["pow_sh"], consts["r32pow"],
      w_limbs, x)


def mod_matmul_rowmod_jnp(w_limbs, x, consts):
    x_l = _data_limbs(x)
    dots = [[jax.lax.dot_general(
        w_limbs[l], x_l[m], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32) for m in range(NL)]
        for l in range(NL)]
    q = consts["q"]
    pows = [consts["pow"][s] for s in range(NTOT)]
    pow_shs = [consts["pow_sh"][s] for s in range(NTOT)]
    r32pows = [consts["r32pow"][s] for s in range(NTOT)]
    return _recombine(dots, q, pows, pow_shs, r32pows)


def mod_matmul_rowmod(w_limbs, x, consts):
    if jax.default_backend() == "tpu" and x.shape[-1] % 128 == 0:
        return mod_matmul_rowmod_tpu(w_limbs, x, consts)
    return mod_matmul_rowmod_jnp(w_limbs, x, consts)
