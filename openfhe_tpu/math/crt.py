"""Host-side exact CRT interpolation and residue generation.

Reference analog: /root/reference DCRTPolyInterface::CRTInterpolate
(src/core/include/lattice/hal/default/dcrtpoly-interface.h:859) — used at the
data boundary (decode, debugging); Python ints give exact arbitrary
precision, replacing the BigInteger backends. Hot paths never call this on
device; a C++ ctypes fast path (native/) accelerates large-N decode.
"""

from __future__ import annotations

import numpy as np


def crt_precompute(moduli):
    big = 1
    for m in moduli:
        big *= m
    coeffs = []
    for m in moduli:
        h = big // m
        coeffs.append(h * pow(h % m, -1, m))
    return big, coeffs


def interpolate(residues: np.ndarray, moduli) -> tuple:
    """Exact CRT lift of [k, N] residues -> (list of Python ints in [0, Q), Q)."""
    big, coeffs = crt_precompute(moduli)
    acc = np.zeros(residues.shape[-1], dtype=object)
    for i, c in enumerate(coeffs):
        acc = acc + residues[i].astype(object) * c
    acc = acc % big
    return acc, big


def interpolate_centered(residues: np.ndarray, moduli) -> np.ndarray:
    """Exact CRT lift centered to (-Q/2, Q/2], as object (Python int) array."""
    acc, big = interpolate(residues, moduli)
    half = big >> 1
    return np.where(acc > half, acc - big, acc)


def to_float(centered_obj: np.ndarray) -> np.ndarray:
    return np.array([float(v) for v in centered_obj], np.float64)


def interpolate_centered_float(residues: np.ndarray, moduli) -> np.ndarray:
    """Centered CRT value as float64 (the CKKS decode hot path).

    Uses the native C++ Garner kernel (openfhe_tpu/native.py, ~8x the
    python-object path) when built; exact to float64 rounding either way.
    """
    from openfhe_tpu import native
    fast = native.crt_interpolate_centered_double(
        np.ascontiguousarray(residues, np.uint32), moduli)
    if fast is not None:
        return fast
    return to_float(interpolate_centered(residues, moduli))


def to_residues_host(values, moduli) -> np.ndarray:
    """Host lift of (possibly big) signed ints -> [k, N] uint32 residues."""
    vals_arr = np.asarray(values)
    if vals_arr.dtype != object:
        # int64-safe inputs take the native kernel when available
        from openfhe_tpu import native
        fast = native.to_residues_i64(vals_arr.astype(np.int64), moduli)
        if fast is not None:
            return fast
    vals = np.asarray(values, dtype=object)
    out = np.zeros((len(moduli), len(vals)), np.uint32)
    for i, m in enumerate(moduli):
        out[i] = (vals % m).astype(np.uint64).astype(np.uint32)
    return out
