"""Single-kernel fused 4-step NTT on the MXU (Pallas, production TPU path).

Third-generation NTT (gen 1: ops/ntt.py VPU reshape stages; gen 2:
ops/ntt4step.py multi-call MXU path). One pallas grid step performs the
ENTIRE negacyclic transform of one [R, C] tower block in VMEM:

    stage 1 matmul -> recombine -> twiddle -> stage 2 matmul -> recombine

with zero HBM intermediates (the gen-2 path round-tripped HBM ~3x per
transform and ran a separate XLA op per stage). Both matmul stages use the
Karatsuba 12-dot int8 scheme and the f32-quotient lazy recombination from
ops/kara.py — measured ~2x faster per transform than gen 2 on v5e.

The twiddle-free contraction trick: stage 2 computes
    Y[d, cc] = sum_b S2[d, b] * WC[cc, b]
directly via an "NT" dot_general (contract axis 1 of both operands), so no
transpose ever materializes.

Output ordering is bit-exact with ops/ntt.py (EVAL = bit-reversed order):
the bit-reversal permutations are folded into the table rows, inherited
from ops/ntt4step's table builder.

Reference analog: transformnat-impl.h:307-330 butterfly loops (the thing
all of this replaces); SURVEY.md §2.4 "Pallas negacyclic NTT kernel".

Requires all moduli <= kara.MAX_MOD (~2^26.99); callers dispatch to the
gen-2 path otherwise (ops/ntt.py handles the policy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openfhe_tpu.lattice.basis import Basis
from openfhe_tpu.math import modops as mo
from openfhe_tpu.ops import kara
from openfhe_tpu.ops import ntt4step

# N=2^13 maps to R=128 x C=64 tiles — still MXU-shaped; N < 2^13 rings
# use ops/ntt_small's whole-matrix transform instead
MIN_RING_DIM = 1 << 13


def supported(b: Basis) -> bool:
    return (jax.default_backend() == "tpu" and b.ring_dim >= MIN_RING_DIM
            and b.ring_dim & (b.ring_dim - 1) == 0
            and kara.kara_supported(b.moduli))


# ---------------------------------------------------------------------------
# host tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _fused_tables_np(moduli: tuple, n: int):
    """Numpy tables: Karatsuba weight stacks + twiddles + epilogue consts."""
    logn = n.bit_length() - 1
    r = 1 << ((logn + 1) // 2)
    c = n // r
    per = [ntt4step._tower_tables_raw(int(q), n) for q in moduli]
    # forward: wr [R,R] (contract axis1 with x axis0), wc [C,C] rows=cc,
    #          cols=b (NT-contracted with s2 axis1)
    wr = np.stack([kara.kara_w_stack_host(p[0]) for p in per])
    wc = np.stack([kara.kara_w_stack_host(p[1]) for p in per])
    # inverse: wci [C,C] rows=b cols=cc NT-contracted with y axis1;
    #          wri [R,R] standard-contracted with s1 axis0
    # _tower_tables_raw returns wri/wci already transposed for the gen-2
    # "x @ W" style; here we need wri[a, d] and wci[b, cc]:
    wri = np.stack([kara.kara_w_stack_host(p[2]) for p in per])
    wci = np.stack([kara.kara_w_stack_host(p[3]) for p in per])
    tw = np.stack([p[4] for p in per])
    twi = np.stack([p[5] for p in per])
    q64 = np.array([int(q) for q in moduli], np.uint64)
    tw_sh = ((tw.astype(np.uint64) << 32) // q64[:, None, None]).astype(np.uint32)
    twi_sh = ((twi.astype(np.uint64) << 32) // q64[:, None, None]).astype(np.uint32)
    return dict(r=r, c=c, wr=wr, wc=wc, wri=wri, wci=wci,
                tw=tw, tw_sh=tw_sh, twi=twi, twi_sh=twi_sh)


def _dev_tables(moduli: tuple, n: int):
    t = _fused_tables_np(moduli, n)
    out = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in t.items()}
    kc = kara.make_kara_consts(moduli)
    out.update(kq=kc["q"], km32=kc["m32"], kc=kc["c"], kratio=kc["ratio"])
    return out


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _kara_nn(w3, x):
    """Standard contraction: block products of w [3, 2D, A] with x [A, B].

    Returns the 9 epilogue sources [D, B] (see kara.kara_sources)."""
    d = w3.shape[1] // 2
    b = x.shape[-1]
    g0c, g2c, g1c = kara.kara_x_groups(x)                  # [A, 2B]
    dots = []
    for g_idx, g in ((0, g0c), (1, g2c), (2, g1c)):
        dots.append(jax.lax.dot_general(
            w3[g_idx], g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
    return kara.kara_sources(dots[0], dots[1], dots[2], d, b)


def _kara_nt(x, w3):
    """NT contraction: block products of x [R, C] with w [3, 2D, C] over C.

    Computes block (i, j) = x_i . w_j (contract last axes). Returns the 9
    sources [R, D]."""
    r = x.shape[0]
    d = w3.shape[1] // 2
    l = kara.data_limbs128(x)
    xg0 = jnp.concatenate([l[0], l[1]], axis=0)            # [2R, C]
    xg2 = jnp.concatenate([l[2], l[3]], axis=0)
    xg1 = jnp.concatenate([kara._add_i8(l[0], l[2]),
                           kara._add_i8(l[1], l[3])], axis=0)
    dots = []
    for g, w_idx in ((xg0, 0), (xg2, 1), (xg1, 2)):
        dots.append(jax.lax.dot_general(
            g, w3[w_idx], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32))             # [2R, 2D]
    return kara.kara_sources(dots[0], dots[1], dots[2], r, d)


def _recombine(ps, t, consts_refs, canonical=True):
    q_ref, m32_ref, c_ref, ratio_ref = consts_refs
    q = q_ref[t]
    c_vec = [c_ref[t, i] for i in range(kara.NSRC)]      # SMEM scalar loads
    r_vec = [ratio_ref[t, i] for i in range(kara.NSRC)]
    return kara.kara_recombine(ps, q, c_vec, r_vec, m32_ref[t],
                               canonical=canonical)


def _fwd_core(x, t, wr_ref, wc_ref, tw_ref, twsh_ref, consts_refs,
              lazy_out=False):
    """Full forward NTT of one [R, C] block in VMEM.

    Stage-1 output feeds the twiddle Shoup multiply, so its recombine is
    always lazy (biased < 32q; mul_mod_shoup canonicalizes). lazy_out=True
    additionally leaves the stage-2 result biased — valid only when the
    caller's next op is itself a Shoup constant-multiply.
    """
    q = consts_refs[0][t]
    s1 = _recombine(_kara_nn(wr_ref[0], x), t, consts_refs, canonical=False)
    s2 = mo.mul_mod_shoup_fast(s1, tw_ref[0], twsh_ref[0], q)
    return _recombine(_kara_nt(s2, wc_ref[0]), t, consts_refs,
                      canonical=not lazy_out)


def _inv_core(y, t, wci_ref, wri_ref, twi_ref, twish_ref, consts_refs,
              lazy_out=False):
    """Full inverse NTT of one [R, C] block in VMEM. See _fwd_core on
    lazy_out; the mid recombine is always lazy (feeds the twiddle Shoup
    multiply)."""
    q = consts_refs[0][t]
    s2t = _recombine(_kara_nt(y, wci_ref[0]), t, consts_refs,
                     canonical=False)                          # [d', b]
    s1 = mo.mul_mod_shoup_fast(s2t, twi_ref[0], twish_ref[0], q)
    return _recombine(_kara_nn(wri_ref[0], s1), t, consts_refs,
                      canonical=not lazy_out)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _ntt_fwd_kernel(q_ref, m32_ref, c_ref, ratio_ref,
                    wr_ref, wc_ref, tw_ref, twsh_ref, x_ref, o_ref):
    t = pl.program_id(1)
    consts = (q_ref, m32_ref, c_ref, ratio_ref)
    o_ref[0, 0] = _fwd_core(x_ref[0, 0], t, wr_ref, wc_ref,
                            tw_ref, twsh_ref, consts)


def _ntt_inv_kernel(q_ref, m32_ref, c_ref, ratio_ref,
                    wci_ref, wri_ref, twi_ref, twish_ref, y_ref, o_ref):
    t = pl.program_id(1)
    consts = (q_ref, m32_ref, c_ref, ratio_ref)
    o_ref[0, 0] = _inv_core(y_ref[0, 0], t, wci_ref, wri_ref,
                            twi_ref, twish_ref, consts)


def _call(kernel, tabs, weight_names, data, k, interpret=False):
    """Common pallas_call wrapper: data [B, k, R, C] -> out same shape."""
    r, c = tabs["r"], tabs["c"]
    batch = data.shape[0]
    wspecs = []
    wargs = []
    for name in weight_names:
        w = tabs[name]
        blk = (1,) + w.shape[1:]
        wspecs.append(pl.BlockSpec(
            blk, (lambda nd: lambda b, t: (t,) + (0,) * (nd - 1))(w.ndim),
            memory_space=pltpu.VMEM))
        wargs.append(w)
    return pl.pallas_call(
        kernel,
        grid=(batch, k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # q
            pl.BlockSpec(memory_space=pltpu.SMEM),   # m32
            pl.BlockSpec(memory_space=pltpu.SMEM),   # c
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ratio
        ] + wspecs + [
            pl.BlockSpec((1, 1, r, c), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, r, c), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, k, r, c), jnp.uint32),
        interpret=interpret,
    )(tabs["kq"], tabs["km32"], tabs["kc"], tabs["kratio"], *wargs, data)


def _reshape_in(x, r, c):
    lead = x.shape[:-2]
    k = x.shape[-2]
    batch = int(np.prod(lead)) if lead else 1
    return x.reshape(batch, k, r, c), lead, k


def ntt_fwd_fused(x: jnp.ndarray, b: Basis, *, interpret=False) -> jnp.ndarray:
    """Drop-in for ops.ntt.ntt_fwd: [..., k, N] COEFF -> EVAL (bitrev)."""
    tabs = _dev_tables(b.moduli, b.ring_dim)
    x4, lead, k = _reshape_in(x, tabs["r"], tabs["c"])
    out = _call(_ntt_fwd_kernel, tabs, ("wr", "wc", "tw", "tw_sh"), x4, k,
                interpret=interpret)
    return out.reshape(lead + (k, b.ring_dim))


def ntt_inv_fused(y: jnp.ndarray, b: Basis, *, interpret=False) -> jnp.ndarray:
    """Drop-in for ops.ntt.ntt_inv: [..., k, N] EVAL (bitrev) -> COEFF."""
    tabs = _dev_tables(b.moduli, b.ring_dim)
    y4, lead, k = _reshape_in(y, tabs["r"], tabs["c"])
    out = _call(_ntt_inv_kernel, tabs, ("wci", "wri", "twi", "twi_sh"), y4, k,
                interpret=interpret)
    return out.reshape(lead + (k, b.ring_dim))
