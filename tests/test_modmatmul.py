"""Exactness of the MXU modular-matmul primitive and the 4-step NTT.

The pallas kernels engage on TPU; their jnp twins (identical math) are
exercised here on CPU against exact big-int references and the VPU NTT.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from openfhe_tpu.lattice.basis import make_basis
from openfhe_tpu.math import nbtheory
from openfhe_tpu.ops import modmatmul as mmx
from openfhe_tpu.ops import ntt4step
from openfhe_tpu.ops.ntt import _ntt_fwd_vpu, _ntt_inv_vpu


def _chain(n, k):
    mods = [nbtheory.first_prime(28, 2 * n)]
    for _ in range(k - 1):
        mods.append(nbtheory.next_prime(mods[-1], 2 * n))
    return mods


def test_mod_matmul_exact():
    rng = np.random.default_rng(0)
    k, d, a, b = 3, 64, 48, 256
    mods = _chain(1 << 10, k)
    w = rng.integers(0, np.array(mods)[:, None, None], (k, d, a))
    x = rng.integers(0, np.array(mods)[:, None, None], (k, a, b))
    w_l = jnp.asarray(np.stack([mmx.balanced_limbs_host(w[t])
                                for t in range(k)]))
    consts = mmx.make_mod_matmul_consts(mods)
    got = np.asarray(mmx.mod_matmul_jnp(w_l, jnp.asarray(
        x.astype(np.uint32)), consts))
    for t in range(k):
        ref = (w[t].astype(object) @ x[t].astype(object)) % mods[t]
        assert np.array_equal(got[t], ref.astype(np.uint32))


def test_mod_matmul_rowmod_exact():
    rng = np.random.default_rng(1)
    d, a, b = 20, 13, 128
    out_mods = _chain(1 << 10, d)
    # framework moduli are < 2^30, so matrix entries fit 4 balanced limbs
    w = rng.integers(0, 1 << 30, (d, a))
    x = rng.integers(0, 1 << 30, (a, b))
    w_l = jnp.asarray(mmx.balanced_limbs_host(w))
    consts = mmx.make_rowmod_consts(out_mods)
    got = np.asarray(mmx.mod_matmul_rowmod_jnp(
        w_l, jnp.asarray(x.astype(np.uint32)), consts))
    ref = (w.astype(object) @ x.astype(object))
    for j in range(d):
        assert np.array_equal(got[j], (ref[j] % out_mods[j]
                                       ).astype(np.uint32))


@pytest.mark.parametrize("n", [1 << 12, 1 << 13])
def test_ntt_4step_matches_vpu(n):
    mods = _chain(n, 2)
    basis = make_basis(mods, n)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, np.array(mods)[:, None],
                                 (2, n)).astype(np.uint32))
    fwd4 = ntt4step.ntt_fwd_4step(x, basis)
    assert jnp.array_equal(fwd4, _ntt_fwd_vpu(x, basis))
    assert jnp.array_equal(ntt4step.ntt_inv_4step(fwd4, basis), x)
    # batched leading dims
    xb = jnp.stack([x, jnp.roll(x, 3, axis=-1)])
    assert jnp.array_equal(ntt4step.ntt_fwd_4step(xb, basis),
                           _ntt_fwd_vpu(xb, basis))
