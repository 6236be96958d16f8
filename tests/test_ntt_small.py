"""Small-ring full-matrix MXU NTT (ops/ntt_small) vs the VPU reference.

Reference analog: the transform round-trip oracles of
src/core/unittest/UnitTestTransform.cpp — here additionally bit-exact
cross-checks between independent implementations (SURVEY.md §4).
"""
import numpy as np
import pytest

from openfhe_tpu.lattice.basis import make_basis
from openfhe_tpu.math.nbtheory import first_prime, next_prime
from openfhe_tpu.ops import ntt_small
from openfhe_tpu.ops.ntt import _ntt_fwd_vpu, _ntt_inv_vpu


def _basis(n, k=1, bits=27):
    qs = []
    q = first_prime(bits, 2 * n)
    for _ in range(k):
        qs.append(q)
        q = next_prime(q, 2 * n)
    return make_basis(qs, n)


@pytest.mark.parametrize("n,k", [(128, 1), (1024, 1), (256, 3)])
def test_mat_ntt_matches_vpu(n, k):
    b = _basis(n, k)
    rng = np.random.default_rng(7)
    x = rng.integers(0, np.asarray(b.q).min(), (4, k, n)).astype(np.uint32)
    got = np.asarray(ntt_small.ntt_fwd_mat(x, b, force_ref=True))
    want = np.asarray(_ntt_fwd_vpu(x, b))
    np.testing.assert_array_equal(got, want)

    got_i = np.asarray(ntt_small.ntt_inv_mat(want, b, force_ref=True))
    want_i = np.asarray(_ntt_inv_vpu(want, b))
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_array_equal(got_i, x)


def test_mat_ntt_pallas_interpret():
    """The actual pallas kernel (interpret mode) against the jnp path,
    including row padding and d-tiling index maps."""
    n, k = 256, 2
    b = _basis(n, k)
    rng = np.random.default_rng(3)
    x = rng.integers(0, np.asarray(b.q).min(), (5, k, n)).astype(np.uint32)

    tabs = ntt_small._dev_tables(b)
    import jax.numpy as jnp
    rows = 5
    xk = jnp.moveaxis(jnp.asarray(x), 1, 0)               # [k, B, N]
    dt, tb = ntt_small._pick_tiles(n, rows)
    pad = (-rows) % tb
    if pad:
        xk = jnp.concatenate(
            [xk, jnp.zeros((k, pad, n), xk.dtype)], axis=1)
    out = ntt_small._mat_call(tabs["wf"], xk, tabs["consts"], dt, tb,
                              interpret=True)[:, :rows]
    want = np.asarray(_ntt_fwd_vpu(x, b))
    np.testing.assert_array_equal(
        np.asarray(jnp.moveaxis(out, 0, 1)), want)


def test_mat_ntt_dtile_interpret():
    """Force multiple d-tiles to exercise the (t, d, r) grid index maps."""
    n = 1024
    b = _basis(n, 1)
    rng = np.random.default_rng(9)
    x = rng.integers(0, np.asarray(b.q).min(), (2, 1, n)).astype(np.uint32)
    tabs = ntt_small._dev_tables(b)
    import jax.numpy as jnp
    xk = jnp.moveaxis(jnp.asarray(x), 1, 0)
    pad = (-2) % 8
    xk = jnp.concatenate([xk, jnp.zeros((1, pad, n), xk.dtype)], axis=1)
    out = ntt_small._mat_call(tabs["wf"], xk, tabs["consts"],
                              256, 8, interpret=True)[:, :2]
    want = np.asarray(_ntt_fwd_vpu(x, b))
    np.testing.assert_array_equal(np.asarray(jnp.moveaxis(out, 0, 1)), want)


def test_pick_tiles_scoped_vmem_budget():
    """Tile picks must keep the kernel's total scoped VMEM (double-buffered
    w/x/out blocks + dot and limb scratch) under the 16 MB v5e limit.
    Round-5 regression: at N=2048 (STD192-class binfhe rings) the per-block
    bounds passed but the sum hit 17 MB and Mosaic rejected the kernel."""
    from openfhe_tpu.ops import modmatmul as m1
    for n in (128, 256, 512, 1024, 2048):
        for rows in (8, 256, 4096, 6656):
            dt, tb = ntt_small._pick_tiles(n, rows)
            assert n % dt == 0 and dt >= 128
            scoped = (2 * m1.NL * dt * n + 2 * tb * n * 4
                      + 16 * tb * dt * 4 + m1.NL * tb * n
                      + 2 * tb * dt * 4)
            assert scoped <= (14 << 20), (n, rows, dt, tb, scoped)


def test_n2048_tiles_interpret():
    """The exact N=2048 2-tower shape that OOM'd on TPU, under the
    post-clamp tiles (interpret mode, small row count for CPU speed)."""
    n, k = 2048, 2
    b = _basis(n, k)
    rng = np.random.default_rng(9)
    rows = 8
    x = rng.integers(0, np.asarray(b.q).min(), (rows, k, n)).astype(np.uint32)
    import jax.numpy as jnp
    xk = jnp.moveaxis(jnp.asarray(x), 1, 0)
    dt, tb = ntt_small._pick_tiles(n, 6656)   # production pick
    tb = min(tb, rows)
    tabs = ntt_small._dev_tables(b)
    out = ntt_small._mat_call(tabs["wf"], xk, tabs["consts"], dt, tb,
                              interpret=True)
    want = np.asarray(_ntt_fwd_vpu(x, b))
    np.testing.assert_array_equal(np.asarray(out), np.moveaxis(want, 1, 0))
