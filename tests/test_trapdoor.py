"""Trapdoor / GPV sampling tests.

Reference analog: src/core/unittest/UnitTestTrapdoor.cpp (sizes, GadgetTest,
TrapDoorMultTest A*[R;E;I] == G, TrapDoorGaussGqSampTest G z == u,
TrapDoorGaussSampTest A x == u with norm bound).
"""
import numpy as np
import pytest

from openfhe_tpu.lattice import dgsampling as dgs
from openfhe_tpu.lattice import trapdoor as td
from openfhe_tpu.lattice.field2n import COEFFICIENT, EVALUATION
from openfhe_tpu.lattice.ringq import RingParams, RingPoly
from openfhe_tpu.math.matrix import Matrix

N = 64
BASE = 32


@pytest.fixture(scope="module")
def ring():
    return RingParams.create(N, n_bits=28)


def test_trapdoor_sizes(ring):
    k = td.gadget_k(ring.q, BASE)
    A, T = td.trapdoor_gen(ring, dgs.SIGMA, BASE,
                           rng=np.random.default_rng(1))
    assert A.GetRows() == 1 and A.GetCols() == k + 2
    assert T.m_r.GetRows() == 1 and T.m_r.GetCols() == k
    assert T.m_e.GetRows() == 1 and T.m_e.GetCols() == k


def test_trapdoor_mult_identity(ring):
    """A * [[e],[r],[I]] == gadget row g (reference TrapDoorMultTest)."""
    rng = np.random.default_rng(2)
    k = td.gadget_k(ring.q, BASE)
    A, T = td.trapdoor_gen(ring, dgs.SIGMA, BASE, rng=rng)
    alloc = lambda: RingPoly(ring, None, EVALUATION)
    eye = Matrix(alloc, k, k).Identity()
    stack = T.m_e.VStack(T.m_r).VStack(eye)      # (k+2) x k
    trap_mult = A.Mult(stack)                    # 1 x k
    g = Matrix(alloc, 1, k).GadgetVector(BASE)
    assert trap_mult == g


def test_gauss_samp_gq_inverts(ring):
    """G z == u mod q, both digit-sampling variants."""
    rng = np.random.default_rng(3)
    k = td.gadget_k(ring.q, BASE)
    u = rng.integers(0, ring.q, N, dtype=np.int64)
    for fn in (dgs.gauss_samp_gq, dgs.gauss_samp_gq_arb_base):
        z = fn(u, (BASE + 1) * dgs.SIGMA, k, ring.q, BASE, rng)
        acc = np.zeros(N, object)
        for t in range(k):
            acc += (BASE ** t) * z[t].astype(object)
        assert (np.mod(acc - u, ring.q) == 0).all(), fn.__name__


def test_gauss_samp_preimage(ring):
    """A x == u mod q and ||x|| within the spectral bound regime."""
    rng = np.random.default_rng(4)
    k = td.gadget_k(ring.q, BASE)
    A, T = td.trapdoor_gen(ring, dgs.SIGMA, BASE, rng=rng)
    u = RingPoly.uniform(ring, rng)
    x = td.gauss_samp(N, k, A, T, u, rng, BASE)
    assert x.GetRows() == k + 2
    assert td.verify_preimage(A, x, u)
    s = dgs.spectral_bound(N, k, BASE)
    assert x.Norm() < 10 * s      # loose sanity bound on coefficients


def test_zsample_f_distribution():
    """ZSampleF with scalar covariance f = sigma^2 must sample ~ N(c, sigma)
    per coefficient (smoke statistics)."""
    from openfhe_tpu.lattice.field2n import Field2n
    rng = np.random.default_rng(5)
    n, sigma = 32, 12.0
    f = Field2n(np.zeros(n), COEFFICIENT)
    # covariance polynomial sigma^2 * identity => constant coeff only
    data = np.zeros(n, complex)
    data[0] = sigma * sigma
    f = Field2n(data, COEFFICIENT)
    c = Field2n(np.full(n, 3.0), COEFFICIENT)
    samples = np.concatenate(
        [dgs.zsample_f(f, c, rng) for _ in range(64)]).astype(float)
    assert abs(samples.mean() - 3.0) < 0.5
    assert abs(samples.std() - sigma) < 1.5
