"""Field2n: elements of the 2n-th cyclotomic number field Q[x]/(x^n + 1).

Reference analog: /root/reference src/core/include/lattice/field2n{,-impl}.h
(complex-vector field elements used by GPV perturbation sampling).

Format semantics match the reference: COEFFICIENT holds the n rational
coefficients; EVALUATION holds values at the odd 2n-th roots of unity
zeta^(2t+1), zeta = exp(i*pi/n), t = 0..n-1 (DiscreteFourierTransform).
The transform here is one vectorized FFT:  eval = n * ifft(coeff * psi),
psi_k = zeta^k, instead of the reference's explicit DFT loops.

Immutable/functional style (jax-idiomatic): every op returns a new Field2n.
"""

from __future__ import annotations

import numpy as np

COEFFICIENT = "COEFFICIENT"
EVALUATION = "EVALUATION"


class Field2n:
    __slots__ = ("data", "fmt")

    def __init__(self, data, fmt: str = COEFFICIENT):
        self.data = np.asarray(data, np.complex128)
        self.fmt = fmt

    # -- constructors ------------------------------------------------------
    @classmethod
    def zeros(cls, n: int, fmt: str = EVALUATION) -> "Field2n":
        return cls(np.zeros(n, np.complex128), fmt)

    @classmethod
    def from_int_vector(cls, vec) -> "Field2n":
        """(reference Field2n(const Matrix<int64_t>&))"""
        return cls(np.asarray(vec, np.float64), COEFFICIENT)

    # -- basics ------------------------------------------------------------
    def size(self) -> int:
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i]

    def __len__(self):
        return len(self.data)

    def Norm(self) -> float:
        return float(np.abs(self.data).max())

    # -- format ------------------------------------------------------------
    def SwitchFormat(self) -> "Field2n":
        from openfhe_tpu.math import dftransform as dft
        if self.fmt == COEFFICIENT:
            return Field2n(dft.forward_transform(self.data), EVALUATION)
        return Field2n(dft.inverse_transform(self.data), COEFFICIENT)

    def SetFormat(self, fmt: str) -> "Field2n":
        return self if fmt == self.fmt else self.SwitchFormat()

    # -- arithmetic --------------------------------------------------------
    def Plus(self, rhs) -> "Field2n":
        if isinstance(rhs, Field2n):
            assert self.fmt == rhs.fmt, "format mismatch"
            return Field2n(self.data + rhs.data, self.fmt)
        out = self.data.copy()
        if self.fmt == COEFFICIENT:
            out[0] += rhs
        else:
            out += rhs          # adding a scalar constant in eval domain
        return Field2n(out, self.fmt)

    def Minus(self, rhs) -> "Field2n":
        if isinstance(rhs, Field2n):
            assert self.fmt == rhs.fmt, "format mismatch"
            return Field2n(self.data - rhs.data, self.fmt)
        return self.Plus(-rhs)

    def Times(self, rhs) -> "Field2n":
        if isinstance(rhs, Field2n):
            assert self.fmt == EVALUATION and rhs.fmt == EVALUATION, \
                "Times requires EVALUATION format"
            return Field2n(self.data * rhs.data, self.fmt)
        return Field2n(self.data * rhs, self.fmt)

    def ScalarMult(self, d: float) -> "Field2n":
        return Field2n(self.data * d, self.fmt)

    def Inverse(self) -> "Field2n":
        assert self.fmt == EVALUATION, "Inverse requires EVALUATION format"
        return Field2n(np.conj(self.data) / np.abs(self.data) ** 2, self.fmt)

    def ShiftRight(self) -> "Field2n":
        """Multiply by x (reference field2n-impl.h ShiftRight)."""
        assert self.fmt == COEFFICIENT
        out = np.roll(self.data, 1)
        out[0] = -out[0]
        return Field2n(out, COEFFICIENT)

    def __add__(self, rhs):
        return self.Plus(rhs)

    def __radd__(self, rhs):
        return self.Plus(rhs)

    def __sub__(self, rhs):
        return self.Minus(rhs)

    def __mul__(self, rhs):
        return self.Times(rhs)

    def __rmul__(self, rhs):
        return self.Times(rhs)

    def __neg__(self):
        return Field2n(-self.data, self.fmt)

    def __eq__(self, rhs):
        return (isinstance(rhs, Field2n) and self.fmt == rhs.fmt
                and np.allclose(self.data, rhs.data))

    # -- automorphisms / structure ----------------------------------------
    def AutomorphismTransform(self, i: int) -> "Field2n":
        """x -> x^i on evaluation slots (i odd)."""
        assert self.fmt == EVALUATION, "automorphism needs EVALUATION"
        assert i % 2 == 1, "automorphism index must be odd"
        n = len(self.data)
        m = 2 * n
        t = np.arange(n)
        idx = ((2 * t + 1) * i) % m
        out = np.empty(n, np.complex128)
        out[(idx - 1) // 2] = self.data
        return Field2n(out, EVALUATION)

    def Transpose(self) -> "Field2n":
        """Conjugate-transpose element t(x) = a(x^-1) (reference
        field2n-impl.h Transpose)."""
        if self.fmt == EVALUATION:
            return self.AutomorphismTransform(2 * len(self.data) - 1)
        out = np.empty_like(self.data)
        out[0] = self.data[0]
        out[1:] = -self.data[:0:-1]
        return Field2n(out, COEFFICIENT)

    def ExtractEven(self) -> "Field2n":
        assert self.fmt == COEFFICIENT
        return Field2n(self.data[0::2], COEFFICIENT)

    def ExtractOdd(self) -> "Field2n":
        assert self.fmt == COEFFICIENT
        return Field2n(self.data[1::2], COEFFICIENT)

    def Permute(self) -> "Field2n":
        """Interleaved -> [evens | odds] (reference Permute)."""
        assert self.fmt == COEFFICIENT
        return Field2n(np.concatenate([self.data[0::2], self.data[1::2]]),
                       COEFFICIENT)

    def InversePermute(self) -> "Field2n":
        assert self.fmt == COEFFICIENT
        n = len(self.data)
        out = np.empty_like(self.data)
        out[0::2] = self.data[:n // 2]
        out[1::2] = self.data[n // 2:]
        return Field2n(out, COEFFICIENT)
