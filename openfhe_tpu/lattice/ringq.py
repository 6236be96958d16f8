"""Single-modulus negacyclic ring Z_q[x]/(x^n + 1) for host-side lattice ops.

Reference analog: /root/reference NativePoly (src/core/include/lattice/hal/
default/poly*.h) as used by the trapdoor/GPV machinery.  The FHE hot path
uses the RNS tower tensors (lattice/dcrt.py) on TPU; this compact host type
backs trapdoor generation and Gaussian preimage sampling, which are
setup-path operations.

Exact arithmetic: NTT mod q via the shared host kernel
(pke/encoding/packed.py _host_ntt, uint64-safe for q < 2^32).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from openfhe_tpu.math import nbtheory
from openfhe_tpu.pke.encoding.packed import _host_ntt

COEFFICIENT = "COEFFICIENT"
EVALUATION = "EVALUATION"


@lru_cache(maxsize=32)
def _ring(n: int, q: int):
    return RingParams(n, q)


@dataclass(frozen=True)
class RingParams:
    n: int
    q: int

    @staticmethod
    def create(n: int, n_bits: int = 0, q: int = 0) -> "RingParams":
        """Pick an NTT-friendly prime (q = 1 mod 2n) when not given."""
        if q == 0:
            q = nbtheory.first_prime(n_bits or 30, 2 * n)
        return _ring(n, q)


class RingPoly:
    __slots__ = ("params", "data", "fmt")

    def __init__(self, params: RingParams, data=None,
                 fmt: str = EVALUATION):
        self.params = params
        self.data = (np.zeros(params.n, np.uint64) if data is None
                     else np.mod(np.asarray(data, np.int64),
                                 params.q).astype(np.uint64))
        self.fmt = fmt

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_coeffs(cls, params, coeffs) -> "RingPoly":
        return cls(params, coeffs, COEFFICIENT)

    @classmethod
    def constant(cls, params, value: int,
                 fmt: str = EVALUATION) -> "RingPoly":
        if fmt == EVALUATION:
            return cls(params, np.full(params.n, value % params.q,
                                       np.int64), EVALUATION)
        c = np.zeros(params.n, np.int64)
        c[0] = value % params.q
        return cls(params, c, COEFFICIENT)

    @classmethod
    def uniform(cls, params, rng) -> "RingPoly":
        return cls(params, rng.integers(0, params.q, params.n,
                                        dtype=np.int64), EVALUATION)

    # -- format ------------------------------------------------------------
    def SetFormat(self, fmt: str) -> "RingPoly":
        if fmt == self.fmt:
            return self
        out = _host_ntt(self.data, self.params.q, self.params.n,
                        inverse=(fmt == COEFFICIENT))
        return RingPoly(self.params, out.astype(np.int64), fmt)

    # -- arithmetic (mod q) ------------------------------------------------
    def _bin(self, other, op) -> "RingPoly":
        q = np.uint64(self.params.q)
        if isinstance(other, RingPoly):
            assert self.fmt == other.fmt, "format mismatch"
            return RingPoly(self.params,
                            op(self.data, other.data, q).astype(np.int64),
                            self.fmt)
        v = np.uint64(int(other) % self.params.q)
        if self.fmt == EVALUATION:
            return RingPoly(self.params,
                            op(self.data, np.full_like(self.data, v),
                               q).astype(np.int64), self.fmt)
        d = self.data.copy()
        d[0] = op(d[:1], np.array([v], np.uint64), q)[0]
        return RingPoly(self.params, d.astype(np.int64), self.fmt)

    def __add__(self, other):
        return self._bin(other, lambda a, b, q: (a + b) % q)

    def __sub__(self, other):
        return self._bin(other, lambda a, b, q: (a + q - b) % q)

    def __mul__(self, other):
        if isinstance(other, RingPoly):
            assert self.fmt == EVALUATION and other.fmt == EVALUATION, \
                "ring multiply requires EVALUATION format"
            q = np.uint64(self.params.q)
            return RingPoly(self.params,
                            (self.data * other.data % q).astype(np.int64),
                            EVALUATION)
        v = np.uint64(int(other) % self.params.q)
        q = np.uint64(self.params.q)
        return RingPoly(self.params,
                        (self.data * v % q).astype(np.int64), self.fmt)

    def __rmul__(self, other):
        return self.__mul__(other)

    def __neg__(self):
        q = np.uint64(self.params.q)
        return RingPoly(self.params,
                        ((q - self.data) % q).astype(np.int64), self.fmt)

    def __eq__(self, other):
        return (isinstance(other, RingPoly) and self.fmt == other.fmt
                and bool((self.data == other.data).all()))

    def Transpose(self) -> "RingPoly":
        """a(x) -> a(x^-1) = a(x^(2n-1)) (reference Poly::Transpose)."""
        c = self.SetFormat(COEFFICIENT)
        out = np.zeros_like(c.data)
        out[0] = c.data[0]
        out[1:] = (np.uint64(self.params.q) - c.data[:0:-1]) \
            % np.uint64(self.params.q)
        return RingPoly(self.params, out.astype(np.int64),
                        COEFFICIENT).SetFormat(self.fmt)

    # -- views -------------------------------------------------------------
    def centered(self) -> np.ndarray:
        """Coefficients lifted to (-q/2, q/2] as int64."""
        c = self.SetFormat(COEFFICIENT).data.astype(np.int64)
        q = self.params.q
        return np.where(c > q // 2, c - q, c)

    def Norm(self) -> float:
        return float(np.abs(self.centered()).max())
