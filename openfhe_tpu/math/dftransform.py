"""Discrete Fourier transform over the complex field.

Reference analog: /root/reference src/core/include/math/dftransform.h
(DiscreteFourierTransform: ForwardTransform/InverseTransform at the odd
2n-th roots of unity — the negacyclic embedding used by Field2n — plus the
plain FFT helpers).

TPU-first: everything is one vectorized numpy FFT (the reference builds
per-size twiddle caches and runs explicit butterflies on the host).  The
negacyclic evaluation points are zeta^(2t+1), zeta = exp(i*pi/n):
    fwd(c)[t] = sum_k c_k zeta^{k(2t+1)}  =  n * ifft(c * psi)[t],
with psi_k = zeta^k.
"""

from __future__ import annotations

import numpy as np


def _psi(n: int) -> np.ndarray:
    return np.exp(1j * np.pi * np.arange(n) / n)


def forward_transform(coeffs) -> np.ndarray:
    """(reference DiscreteFourierTransform::ForwardTransform) coefficients
    -> values at the n odd 2n-th roots of unity."""
    a = np.asarray(coeffs, np.complex128)
    n = len(a)
    return np.fft.ifft(a * _psi(n)) * n


def inverse_transform(values) -> np.ndarray:
    """(reference DiscreteFourierTransform::InverseTransform)"""
    v = np.asarray(values, np.complex128)
    n = len(v)
    return np.fft.fft(v) / n * np.conj(_psi(n))


def fft_forward(a) -> np.ndarray:
    """Plain cyclic DFT (reference FFTForwardTransform)."""
    return np.fft.fft(np.asarray(a, np.complex128))


def fft_inverse(a) -> np.ndarray:
    return np.fft.ifft(np.asarray(a, np.complex128))
