"""Discrete Gaussian sampling over the integers with arbitrary center/sigma.

Reference analog: /root/reference src/core/include/math/
discretegaussiangenerator{,-impl}.h (Peikert-inversion table sampler +
GenerateIntegerKarney for arbitrary parameters, KARNEY_THRESHOLD=300) and
discretegaussiangeneratorgeneric.* (constant-time base sampler).

TPU-first redesign: sampling is a host/setup-path operation here (trapdoor
generation, GPV preimage sampling); the encrypt-path noise sampler lives in
math/sampling.py as jax PRNG kernels.  Instead of Karney's bit-by-bit exact
rejection we use:
  * sigma <= _TABLE_SIGMA: exact inversion sampling from the full CDF table
    over center +/- 12 sigma (the Peikert method, exact to float64);
  * larger sigma: rounded continuous Gaussian — statistically within
    ~2^-128 of the discrete Gaussian once sigma exceeds the smoothing
    parameter eta_{2^-128}(Z) ~ 6.7 (the reference itself uses continuous
    normals in PerturbFloat, dgsampling-impl.h:167).
Both paths vectorize over numpy arrays of centers.
"""

from __future__ import annotations

import numpy as np

KARNEY_THRESHOLD = 300.0        # reference discretegaussiangenerator.h:79
_TABLE_SIGMA = 64.0
_TAIL = 12.0


def _table_sample(rng, centers: np.ndarray, sigma: float) -> np.ndarray:
    """Exact inversion sampling, vectorized over fractional centers."""
    centers = np.asarray(centers, np.float64)
    base = np.floor(centers)
    frac = centers - base                      # in [0, 1)
    w = int(np.ceil(_TAIL * sigma)) + 1
    offs = np.arange(-w, w + 1, dtype=np.float64)     # [L]
    # weights exp(-(x - c)^2 / (2 sigma^2)) at x = base + offs, per center
    d = offs[None, :] - frac[..., None].reshape(-1, 1)
    logw = -(d * d) / (2.0 * sigma * sigma)
    wgt = np.exp(logw - logw.max(axis=1, keepdims=True))
    cdf = np.cumsum(wgt, axis=1)
    u = rng.random(cdf.shape[0]) * cdf[:, -1]
    idx = (cdf < u[:, None]).sum(axis=1)
    return (base.reshape(-1) + offs[idx]).astype(np.int64).reshape(
        centers.shape)


def sample_integers(rng, centers, sigma: float) -> np.ndarray:
    """D_{Z, sigma, c} for an array of centers (see module docstring)."""
    centers = np.atleast_1d(np.asarray(centers, np.float64))
    if sigma <= 0:
        return np.round(centers).astype(np.int64)
    if sigma <= _TABLE_SIGMA:
        return _table_sample(rng, centers, sigma)
    return np.round(rng.normal(centers, sigma)).astype(np.int64)


class DiscreteGaussianGenerator:
    """(reference DiscreteGaussianGeneratorImpl)"""

    def __init__(self, sigma: float = 3.19, seed: int | None = None,
                 rng: np.random.Generator | None = None):
        self.sigma = float(sigma)
        self.rng = rng if rng is not None else np.random.default_rng(seed)

    def GenerateInteger(self, center: float = 0.0,
                        sigma: float | None = None) -> int:
        s = self.sigma if sigma is None else sigma
        return int(sample_integers(self.rng, [center], s)[0])

    def GenerateIntegerKarney(self, mean: float, stddev: float) -> int:
        """(reference GenerateIntegerKarney) arbitrary-parameter sampling;
        see module docstring for the redesigned method."""
        return int(sample_integers(self.rng, [mean], stddev)[0])

    def GenerateIntVector(self, size: int) -> np.ndarray:
        return sample_integers(self.rng, np.zeros(size), self.sigma)

    def GenerateVector(self, size: int, centers=None,
                       sigma: float | None = None) -> np.ndarray:
        c = np.zeros(size) if centers is None else centers
        return sample_integers(self.rng, c,
                               self.sigma if sigma is None else sigma)
