"""ctypes bindings for the native host library (native/fhe_host.cpp).

The runtime around the TPU compute path is native where the reference's is:
exact CRT work at the host data boundary (decode, schemelet conversions)
runs in C++ with __int128 arithmetic, ~100x the python-object path at
large N. Falls back to pure Python when the shared library is absent
(build: g++ -O3 -shared -fPIC -o native/libfhe_host.so native/fhe_host.cpp).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.join(os.path.dirname(__file__), "..", "native")
    path = os.path.abspath(os.path.join(root, "libfhe_host.so"))
    src = os.path.abspath(os.path.join(root, "fhe_host.cpp"))
    if not os.path.exists(path) and os.path.exists(src):
        # build on first use (g++ is a baked-in dependency)
        import subprocess
        try:
            subprocess.run(["g++", "-O3", "-march=native", "-shared",
                            "-fPIC", "-o", path, src], check=True,
                           capture_output=True)
        except Exception:
            pass
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _LIB = False
        return False
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.crt_interpolate_centered_double.argtypes = [
        u32p, u64p, ctypes.c_int, ctypes.c_int, f64p]
    lib.to_residues_i64.argtypes = [i64p, u64p, ctypes.c_int, ctypes.c_int,
                                    u32p]
    lib.switch_centered_u64.argtypes = [u64p, ctypes.c_uint64,
                                        ctypes.c_uint64, ctypes.c_int, u64p]
    lib.host_ntt.argtypes = [u64p, ctypes.c_int, ctypes.c_int,
                             ctypes.c_uint64, u64p, u64p, ctypes.c_uint64,
                             ctypes.c_int]
    _LIB = lib
    return lib


def available() -> bool:
    return bool(_load())


def crt_interpolate_centered_double(residues: np.ndarray, moduli
                                    ) -> np.ndarray | None:
    """Centered CRT value as float64 per coefficient (CKKS decode path)."""
    lib = _load()
    if not lib:
        return None
    res = np.ascontiguousarray(residues, np.uint32)
    k, n = res.shape
    mods = np.ascontiguousarray(np.array(moduli, np.uint64))
    out = np.empty(n, np.float64)
    lib.crt_interpolate_centered_double(res, mods, k, n, out)
    return out


def to_residues_i64(values: np.ndarray, moduli) -> np.ndarray | None:
    lib = _load()
    if not lib:
        return None
    vals = np.ascontiguousarray(values, np.int64)
    mods = np.ascontiguousarray(np.array(moduli, np.uint64))
    out = np.empty((len(moduli), len(vals)), np.uint32)
    lib.to_residues_i64(vals, mods, len(moduli), len(vals), out)
    return out


def host_ntt(x: np.ndarray, q: int, psi_br: np.ndarray, ipsi_br: np.ndarray,
             ninv: int, inverse: bool) -> np.ndarray | None:
    """Batched negacyclic NTT mod q on the host (C++, in place on a copy).

    x: [..., n] uint64-compatible; returns same shape uint64, or None when
    the native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if not lib:
        return None
    arr = np.ascontiguousarray(x, np.uint64).copy()
    n = arr.shape[-1]
    batch = int(arr.size // n)
    flat = arr.reshape(batch, n)
    lib.host_ntt(flat, batch, n, q,
                 np.ascontiguousarray(psi_br, np.uint64),
                 np.ascontiguousarray(ipsi_br, np.uint64),
                 int(ninv), 1 if inverse else 0)
    return arr
