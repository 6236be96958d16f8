"""Four-step NTT on the MXU (production path for large rings on TPU).

Decomposes the size-N negacyclic NTT into two size-(R, C) modular matmuls
with a twiddle correction between them (Bailey's 4-step), replacing the
log2(N) reshape-stage VPU passes of ops/ntt.py with MXU int8-limb matmuls
(ops/modmatmul.py). Output ordering matches ops/ntt.py exactly (EVAL in
bit-reversed order): the required permutation factors into 8-bit
bit-reversals folded into the matrix rows at table-build time.

Reference analog: transformnat-impl.h butterflies; the 4-step split is the
TPU-idiomatic mapping promised in SURVEY.md §2.4/§7 ("4-step NTT", base
conversions as matmuls on the MXU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from openfhe_tpu.lattice.basis import Basis, _bitrev_indices
from openfhe_tpu.math import modops as mo
from openfhe_tpu.math import nbtheory
from openfhe_tpu.ops import modmatmul as mmx

# 4-step engages on TPU for rings at least this large; smaller rings keep
# the reshape-stage VPU path (matmul tiles would be badly underutilized)
MIN_RING_DIM = 1 << 14


def _shoup_np(c: np.ndarray, moduli) -> np.ndarray:
    q = np.array(moduli, object)[:, None, None]
    return ((c.astype(object) << 32) // q).astype(np.uint64).astype(np.uint32)


@functools.lru_cache(maxsize=None)
def _tower_tables_raw(q: int, n: int):
    """Raw uint32 4-step matrices for one (modulus, ring) pair.

    Returns (wr, wc, wri, wci, tw, twi):
      wr  [R, R] rows d (bit-rev), cols a     — stage-1 forward weights
      wc  [C, C] rows cc (bit-rev), cols b    — stage-2 forward weights
      wri [R, R] rows a, cols d' (bit-rev)    — stage-B inverse weights
      wci [C, C] rows b, cols cc' (bit-rev)   — stage-A inverse weights
      tw/twi [R, C] indexed [d, b]            — mid twiddles (+ fold-ins)
    Shared by the gen-2 multi-call path and the gen-3 fused kernel.
    """
    logn = n.bit_length() - 1
    r = 1 << ((logn + 1) // 2)
    c = n // r
    br_r = _bitrev_indices(r)
    br_c = _bitrev_indices(c)
    psi = nbtheory.root_of_unity(2 * n, q)
    w = pow(psi, 2, q)
    winv = pow(w, -1, q)
    psiinv = pow(psi, -1, q)
    rinv = pow(r, -1, q)
    cinv = pow(c, -1, q)
    d_i = np.arange(r)
    a_i = np.arange(r)
    c_i = np.arange(c)
    b_i = np.arange(c)
    # forward: S1 = WR @ X ; S2 = S1 * TW ; Y = S2 @ WC^T
    # WR[d, a] = w^(C d a) * psi^(a C); WC[cc, b] = w^(R cc b);
    # TW[d, b] = w^(d b) * psi^b; rows d and cc bit-reversed for layout
    wp = _power_table_np(w, n, q)
    pp = _power_table_np(psi, 2 * n, q)
    wr = ((wp[(c * np.outer(d_i, a_i)) % n]
           * pp[(a_i * c) % (2 * n)][None, :]) % q)[br_r]
    wc = wp[(r * np.outer(c_i, b_i)) % n][br_c]
    tw = ((wp[np.outer(d_i, b_i) % n]
           * pp[b_i % (2 * n)][None, :]) % q)[br_r]
    # inverse: S2 = Y @ (WC^-1)^T ; S1 = S2 * TW^-1 ; X = WR^-1 @ S1
    wip = _power_table_np(winv, n, q)
    pip = _power_table_np(psiinv, 2 * n, q)
    wci = ((wip[(r * np.outer(b_i, c_i)) % n] * cinv) % q)[:, br_c]
    wri = ((wip[(c * np.outer(a_i, d_i)) % n]
            * (pip[(a_i * c) % (2 * n)] * rinv % q)[:, None]) % q)[:, br_r]
    twi = ((wip[np.outer(d_i, b_i) % n]
            * pip[b_i % (2 * n)][None, :]) % q)[br_r]
    return (wr.astype(np.uint32), wc.astype(np.uint32),
            wri.astype(np.uint32), wci.astype(np.uint32),
            tw.astype(np.uint32), twi.astype(np.uint32))


@functools.lru_cache(maxsize=None)
def _tower_tables(q: int, n: int):
    """Gen-2 tables: int8-limb form of the raw matrices (numpy, cached)."""
    wr, wc, wri, wci, tw, twi = _tower_tables_raw(q, n)
    return (mmx.balanced_limbs_host(wr), mmx.balanced_limbs_host(wc),
            mmx.balanced_limbs_host(wri), mmx.balanced_limbs_host(wci),
            tw, twi)


def _power_table_np(base: int, count: int, q: int) -> np.ndarray:
    out = np.ones(count, np.int64)
    cur = 1
    for i in range(1, count):
        cur = cur * base % q
        out[i] = cur
    return out


@functools.lru_cache(maxsize=None)
def _tables(moduli: tuple, n: int):
    """Per-chain assembly of cached per-tower tables (numpy only: this
    cache is shared across jit traces; caching jnp arrays made inside a
    trace would leak tracers)."""
    logn = n.bit_length() - 1
    r = 1 << ((logn + 1) // 2)
    c = n // r
    per = [_tower_tables(int(q), n) for q in moduli]
    tw = np.stack([p[4] for p in per])
    twi = np.stack([p[5] for p in per])
    return dict(
        r=r, c=c, moduli=moduli,
        wr=np.stack([p[0] for p in per]),
        wc=np.stack([p[1] for p in per]),
        wri=np.stack([p[2] for p in per]),
        wci=np.stack([p[3] for p in per]),
        tw=tw, tw_sh=_shoup_np(tw, moduli),
        twi=twi, twi_sh=_shoup_np(twi, moduli),
    )


def _dev_tables(moduli: tuple, n: int):
    t = _tables(moduli, n)
    consts = mmx.make_mod_matmul_consts(moduli)
    out = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in t.items()}
    out["consts"] = consts
    return out


def supported(b: Basis) -> bool:
    return (jax.default_backend() == "tpu" and b.ring_dim >= MIN_RING_DIM
            and b.ring_dim & (b.ring_dim - 1) == 0)


def _merge_lead(x):
    """[..., k, N] -> ([B*k? no] ...) returns (x3d [k, N, B_lead], unflatten)."""
    lead = x.shape[:-2]
    k, n = x.shape[-2], x.shape[-1]
    if lead:
        xb = x.reshape((-1, k, n))
        return xb, lead
    return x[None], lead


def ntt_fwd_4step(x: jnp.ndarray, b: Basis) -> jnp.ndarray:
    """Drop-in for ops.ntt.ntt_fwd on large rings (TPU)."""
    tabs = _dev_tables(b.moduli, b.ring_dim)
    r, c = tabs["r"], tabs["c"]
    consts = tabs["consts"]
    k, n = x.shape[-2], x.shape[-1]
    lead = x.shape[:-2]
    batch = int(np.prod(lead)) if lead else 1
    # [B, k, R, C] -> tower-major with batch folded into columns
    xx = x.reshape((batch, k, r, c)).transpose(1, 2, 0, 3).reshape(k, r,
                                                                   batch * c)
    s1 = mmx.mod_matmul(tabs["wr"], xx, consts)
    s1 = s1.reshape(k, r, batch, c)
    q3 = consts["q"][:, None, None, None]
    s2 = mo.mul_mod_shoup(s1, tabs["tw"][:, :, None, :],
                          tabs["tw_sh"][:, :, None, :], q3)
    # second stage along C: transpose to [k, C, batch*R]
    s2t = s2.transpose(0, 3, 2, 1).reshape(k, c, batch * r)
    s3 = mmx.mod_matmul(tabs["wc"], s2t, consts)
    out = s3.reshape(k, c, batch, r).transpose(2, 0, 3, 1)
    return out.reshape(lead + (k, n)) if lead else out[0].reshape(k, n)


def ntt_inv_4step(x: jnp.ndarray, b: Basis) -> jnp.ndarray:
    """Drop-in for ops.ntt.ntt_inv on large rings (TPU)."""
    tabs = _dev_tables(b.moduli, b.ring_dim)
    r, c = tabs["r"], tabs["c"]
    consts = tabs["consts"]
    k, n = x.shape[-2], x.shape[-1]
    lead = x.shape[:-2]
    batch = int(np.prod(lead)) if lead else 1
    # input layout [d', c'] = EVAL bitrev: Y[d', c'] with j = d'*C + c'
    y = x.reshape((batch, k, r, c)).transpose(1, 3, 0, 2).reshape(k, c,
                                                                  batch * r)
    s2 = mmx.mod_matmul(tabs["wci"], y, consts)            # [k, C, B*R]? no:
    # wci is [C, C] acting on the c' axis: output S2^T fragments
    s2 = s2.reshape(k, c, batch, r).transpose(0, 3, 2, 1)  # [k, R, B, C]
    q3 = consts["q"][:, None, None, None]
    s1 = mo.mul_mod_shoup(s2, tabs["twi"][:, :, None, :],
                          tabs["twi_sh"][:, :, None, :], q3)
    s1 = s1.reshape(k, r, batch * c)
    xx = mmx.mod_matmul(tabs["wri"], s1, consts)
    out = xx.reshape(k, r, batch, c).transpose(2, 0, 1, 3)
    return out.reshape(lead + (k, n)) if lead else out[0].reshape(k, n)
