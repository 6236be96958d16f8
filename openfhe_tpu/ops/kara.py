"""Karatsuba int8-limb modular dot products + f32-quotient recombination.

The second-generation exact-modmul-by-matmul scheme behind the fused NTT
and base-conversion kernels (first generation: ops/modmatmul.py).
Reference analogs: the NTT butterflies (transformnat-impl.h:307-330) and
ApproxSwitchCRTBasis accumulation (dcrtpoly-impl.h) — re-expressed as MXU
matmuls, which is the TPU-idiomatic mapping (SURVEY.md §2.4).

Two ideas versus ops/modmatmul:

1. **Karatsuba limbs (12 int8 dots instead of 16).** Values < 2^27 split
   into 4 balanced base-128 digits (|d| <= 64), grouped into two 2-digit
   super-digits A = A0 + A1*2^14. One Karatsuba level:
       A*B = P0 + (P1 - P0 - P2)*2^14 + P2*2^28,
       P0 = A0*B0, P2 = A1*B1, P1 = (A0+A1)*(B0+B1).
   Digit sums |a_i + a_{i+2}| <= 128 still fit int8, so each P* is a
   2x2-digit schoolbook block = 4 int8 dots -> 12 dots total (0.75x the
   MACs of the 16-dot schoolbook — the MXU is the measured bottleneck).

2. **f32-quotient lazy recombination (~3x fewer VPU ops).** The epilogue
   out = sum_s p_s * K_s mod q (9 sources p_s with |p_s| < 2^23, exact in
   f32) replaces per-source Shoup multiplies with one fused estimate:
       S_g = sum_{s in group g} f32(p_s) * (K_s / q),   u_g = round(S_g)
       T   = sum_s p_s * K_s  (int32, wraps mod 2^32 harmlessly)
       t   = T - (u_0 + u_1) * q   + 16q bias -> Barrett -> canonical.
   Two rounding groups keep |t| < 16q; q < 2^27 guarantees the biased
   value fits uint32 (error budget certified in `_check_error_budget`).

Constraint: every modulus must be < 2^27 (and NTT-friendly: = 1 mod 2N).
Callers fall back to ops/modmatmul for larger moduli.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from openfhe_tpu.math import modops as mo

NDIG = 4            # base-128 balanced digits covering |v| < ~2^27
NSRC = 9            # p0_{0..2}, p1_{0..2}, p2_{0..2}
KARA_GROUPS = 3     # weight stack groups (P0, P2, P1), each 2 digit rows
# balanced digits lie in [-64, 63], so 4 of them represent at most
# 63 * (1 + 128 + 128^2 + 128^3); moduli must not exceed this (+1)
MAX_MOD = 63 * (1 + 128 + 128**2 + 128**3) + 1   # 133160896 ~ 2^26.99
MAX_MOD_BITS = 27

_BIAS_Q = 16        # t + 16q must stay in [0, 32q) — see error budget


def kara_supported(moduli) -> bool:
    return all(int(q) <= MAX_MOD for q in moduli)


# ---------------------------------------------------------------------------
# host-side builders
# ---------------------------------------------------------------------------

def balanced_limbs128_host(m: np.ndarray) -> np.ndarray:
    """[*dims] int -> [NDIG, *dims] int8 with m = sum d_i * 128^i, |d|<=64."""
    out = np.zeros((NDIG,) + m.shape, np.int8)
    mm = m.astype(np.int64).copy()
    for i in range(NDIG):
        d = ((mm + 64) % 128) - 64
        out[i] = d.astype(np.int8)
        mm = (mm - d) >> 7
    if not np.all(mm == 0):
        raise ValueError("entries exceed 4 base-128 balanced digits (2^27)")
    return out


def kara_w_stack_host(w: np.ndarray) -> np.ndarray:
    """Weight matrix [D, A] (uint, entries < 2^27) -> [3, 2D, A] int8.

    Group g holds the stacked digit-pair rows of one Karatsuba
    block-product operand (pre-reshaped on host — Mosaic cannot reshape
    sliced int8 vectors in-kernel):
      g=0 (P0): [w0; w1]   g=1 (P2): [w2; w3]   g=2 (P1): [w0+w2; w1+w3]
    """
    l = balanced_limbs128_host(w)
    s02 = (l[0].astype(np.int16) + l[2]).astype(np.int8)
    s13 = (l[1].astype(np.int16) + l[3]).astype(np.int8)
    return np.stack([np.concatenate([l[0], l[1]], axis=0),
                     np.concatenate([l[2], l[3]], axis=0),
                     np.concatenate([s02, s13], axis=0)], axis=0)


def make_kara_consts(moduli) -> dict:
    """Per-tower epilogue constants.

    K_s folds the three Karatsuba shift corrections:
      value = sum_t p0_t*(2^{7t} - 2^{7t+14})
            + sum_t p1_t* 2^{7t+14}
            + sum_t p2_t*(2^{7t+28} - 2^{7t+14})
    c[s]     = K_s mod q (uint32; also used for the int32 wrap-sum T)
    ratio[s] = float32(K_s mod q / q)
    """
    kk = len(moduli)
    c = np.zeros((kk, NSRC), np.uint32)
    ratio = np.zeros((kk, NSRC), np.float32)
    m32 = np.zeros((kk,), np.uint32)
    for ti, qq in enumerate(moduli):
        q = int(qq)
        if q > MAX_MOD:
            raise ValueError(f"modulus {q} too large for kara epilogue")
        for t in range(3):
            vals = (
                (pow(2, 7 * t, q) - pow(2, 7 * t + 14, q)) % q,   # p0_t
                pow(2, 7 * t + 14, q),                            # p1_t
                (pow(2, 7 * t + 28, q) - pow(2, 7 * t + 14, q)) % q,  # p2_t
            )
            for s in range(3):
                c[ti, 3 * s + t] = vals[s]
                ratio[ti, 3 * s + t] = vals[s] / q
        m32[ti] = (1 << 32) // q
    return dict(q=jnp.asarray(np.array([int(m) for m in moduli], np.uint32)),
                m32=jnp.asarray(m32),
                c=jnp.asarray(c), ratio=jnp.asarray(ratio))


def make_kara_rowmod_consts(out_moduli) -> dict:
    """Epilogue constants for per-OUTPUT-ROW moduli (RNS base conversion:
    out[d] = sum_i y[i] * W[i, d] mod q_d). Shapes broadcast over [D, B]:
    q/m32 [D, 1]; c [NSRC, D, 1] uint32; ratio [NSRC, D, 1] float32."""
    d = len(out_moduli)
    c = np.zeros((NSRC, d), np.uint32)
    ratio = np.zeros((NSRC, d), np.float32)
    m32 = np.zeros((d,), np.uint32)
    q = np.zeros((d,), np.uint32)
    for di, qq in enumerate(out_moduli):
        qi = int(qq)
        if qi > MAX_MOD:
            raise ValueError(f"modulus {qi} too large for kara epilogue")
        for t in range(3):
            vals = (
                (pow(2, 7 * t, qi) - pow(2, 7 * t + 14, qi)) % qi,
                pow(2, 7 * t + 14, qi),
                (pow(2, 7 * t + 28, qi) - pow(2, 7 * t + 14, qi)) % qi,
            )
            for s in range(3):
                c[3 * s + t, di] = vals[s]
                ratio[3 * s + t, di] = vals[s] / qi
        m32[di] = (1 << 32) // qi
        q[di] = qi
    return dict(q=jnp.asarray(q.reshape(d, 1)),
                m32=jnp.asarray(m32.reshape(d, 1)),
                c=jnp.asarray(c.reshape(NSRC, d, 1)),
                ratio=jnp.asarray(ratio.reshape(NSRC, d, 1)))


def _check_error_budget():
    """Certify the lazy-epilogue bound (documentation-as-code).

    |p_s| <= 2 * 256 * 128 * 128 = 2^23 (two dots of K<=256 int8 pairs with
    |digits| <= 128). Per rounding group g (<=5 terms):
      term err  <= 5 * (ulp(2^23)=1)            [cvt exact, mult+ratio rnd]
      tree adds <= 4 adds at |sum| <= 5*2^23 -> <= 4 * 4
      round     <= 0.5
    => |u_g - S_g^true| <= ~22 per group is loose; empirically < 8.  The
    implementation uses bias 16q and asserts q < 2^27 so that
    t + 16q in [0, 32q) subset [0, 2^32). Fuzz tests (tests/test_kara.py)
    hammer adversarial +-64/+-128 digit patterns to validate in practice.
    """


# ---------------------------------------------------------------------------
# device-side pieces (shared by the jnp reference path and pallas kernels)
# ---------------------------------------------------------------------------

# bias injecting +64 at every 7-bit digit position; digit extraction from
# the biased value needs no serial borrow chain (carries are already folded
# into the higher bits by the one add)
_DIGIT_BIAS = 64 * (1 + (1 << 7) + (1 << 14) + (1 << 21))


def data_limbs128(v_u32):
    """uint32 [..., A, B] (canonical, < 2^27) -> list of NDIG int8 arrays
    (balanced base-128, |d| <= 64).

    One biased add replaces the serial compute-digit/subtract/shift chain:
    w = v + 64*(2^0 + 2^7 + 2^14 + 2^21) makes every balanced digit a plain
    unsigned field extract, d_i = ((w >> 7i) & 127) - 64, since
    sum_i (w_i - 64) * 2^{7i} = w - bias = v exactly (w < 2^28)."""
    w = v_u32.astype(jnp.int32) + _DIGIT_BIAS
    outs = []
    for i in range(NDIG):
        outs.append((((w >> (7 * i)) & 127) - 64).astype(jnp.int8))
    return outs


def _add_i8(a, b):
    """int8 + int8 -> int8 via int32 (Mosaic lacks vector addi on i8)."""
    return (a.astype(jnp.int32) + b.astype(jnp.int32)).astype(jnp.int8)


def kara_x_groups(v_u32):
    """uint32 [A, B] -> 3 int8 arrays [A, 2B]: P0|P2|P1 column groups."""
    l = data_limbs128(v_u32)
    g0 = jnp.concatenate([l[0], l[1]], axis=-1)
    g2 = jnp.concatenate([l[2], l[3]], axis=-1)
    g1 = jnp.concatenate([_add_i8(l[0], l[2]), _add_i8(l[1], l[3])], axis=-1)
    return g0, g2, g1


def kara_dots(w_stack, x_u32):
    """The three Karatsuba block dots.

    w_stack: int8 [3, 2D, A] (kara_w_stack_host); x_u32: uint32 [A, B].
    Returns (d0, d2, d1): int32 [2D, 2B] each, where block (i, j) of dg is
    (w-digit i) x (x-digit j) for that group.
    """
    g0, g2, g1 = kara_x_groups(x_u32)

    def dot(w, g):
        # w [2D, A] x g [A, 2B] -> [2D, 2B]; block (i, j) = w_i @ x_j
        return jax.lax.dot_general(w, g, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    return dot(w_stack[0], g0), dot(w_stack[1], g2), dot(w_stack[2], g1)


def kara_sources(d0, d2, d1, d_dim, b_dim):
    """Extract the 9 epilogue sources p_s [D, B] from the block dots.

    Order matches make_kara_consts: s = 3*{P0,P1,P2-group} + t.
    """
    def blocks(dd):
        return [[dd[i * d_dim:(i + 1) * d_dim, j * b_dim:(j + 1) * b_dim]
                 for j in range(2)] for i in range(2)]
    b0, b2, b1 = blocks(d0), blocks(d2), blocks(d1)

    def tri(bb):
        return (bb[0][0], bb[0][1] + bb[1][0], bb[1][1])
    p0 = tri(b0)
    p2 = tri(b2)
    p1 = tri(b1)
    return [p0[0], p0[1], p0[2], p1[0], p1[1], p1[2], p2[0], p2[1], p2[2]]


def kara_recombine(ps, q, c_vec, ratio_vec, m32, canonical=True):
    """sum_s p_s * K_s mod q via the f32-quotient lazy epilogue.

    ps: 9 int32 arrays [D, B] (|p| <= 2^23); q/m32 scalars-or-columns;
    c_vec/ratio_vec: indexable [9] (uint32 / float32). Returns uint32
    canonical [D, B].

    canonical=False skips the final Barrett pass and returns the biased
    value t = (sum mod q) + e*q with 0 <= t < 32q < 2^32. Use when the
    consumer is a Shoup constant-multiply (`mo.mul_mod_shoup` accepts any
    x < 2^32 and emits a canonical residue), which every NTT stage's
    twiddle/key/scale multiply is — the Barrett there is pure overhead.
    """
    # group A: sources 0-4, group B: 5-8 (two rounding groups)
    def group_u(idx):
        s = None
        for i in idx:
            term = ps[i].astype(jnp.float32) * ratio_vec[i]
            s = term if s is None else s + term
        return jnp.round(s).astype(jnp.int32)

    u = group_u((0, 1, 2, 3, 4)) + group_u((5, 6, 7, 8))
    t = None
    for i in range(NSRC):
        term = ps[i] * c_vec[i].astype(jnp.int32)
        t = term if t is None else t + term
    qi = q.astype(jnp.int32)
    t = t - u * qi + _BIAS_Q * qi
    if not canonical:
        return t.astype(jnp.uint32)
    return mo.barrett_u32(t.astype(jnp.uint32), q, m32)


def mod_matmul_kara_ref(w_stack, x_u32, consts, tower: int):
    """jnp reference path for one tower (used by tests and CPU fallback)."""
    d_dim = w_stack.shape[1] // 2
    b_dim = x_u32.shape[-1]
    d0, d2, d1 = kara_dots(w_stack, x_u32)
    ps = kara_sources(d0, d2, d1, d_dim, b_dim)
    return kara_recombine(ps, consts["q"][tower], consts["c"][tower],
                          consts["ratio"][tower], consts["m32"][tower])
