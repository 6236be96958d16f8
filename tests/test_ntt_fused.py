"""Fused single-kernel NTT (ops/ntt_fused) vs the gen-1 VPU reference.

Runs the pallas kernel in interpret mode on CPU at N=2^14 (the smallest
ring the fused path serves) with kara-compatible 27-bit moduli; checks
bit-exact round trips and agreement with ops.ntt's stage implementation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from openfhe_tpu.lattice.basis import make_basis
from openfhe_tpu.math import nbtheory
from openfhe_tpu.ops import kara, ntt_fused
from openfhe_tpu.ops.ntt import _ntt_fwd_vpu, _ntt_inv_vpu


def _kara_moduli(n, count):
    mods = []
    a = kara.MAX_MOD // (2 * n)
    while len(mods) < count and a > 0:
        q = a * 2 * n + 1
        if q <= kara.MAX_MOD and nbtheory.is_prime(q):
            mods.append(q)
        a -= 1
    assert len(mods) == count
    return tuple(mods)


@pytest.fixture(scope="module")
def basis14():
    n = 1 << 14
    return make_basis(_kara_moduli(n, 3), n)


def test_fused_fwd_matches_vpu(basis14):
    b = basis14
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, min(b.moduli),
                                 size=(3, b.ring_dim)).astype(np.uint32))
    want = np.asarray(_ntt_fwd_vpu(x, b))
    got = np.asarray(ntt_fused.ntt_fwd_fused(x, b, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fused_inv_matches_vpu(basis14):
    b = basis14
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.integers(0, min(b.moduli),
                                 size=(3, b.ring_dim)).astype(np.uint32))
    want = np.asarray(_ntt_inv_vpu(y, b))
    got = np.asarray(ntt_fused.ntt_inv_fused(y, b, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fused_roundtrip_batched(basis14):
    b = basis14
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, min(b.moduli),
                                 size=(2, 3, b.ring_dim)).astype(np.uint32))
    y = ntt_fused.ntt_fwd_fused(x, b, interpret=True)
    back = ntt_fused.ntt_inv_fused(y, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
