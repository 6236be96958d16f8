"""Exactness fuzz for the Karatsuba/f32-quotient modular matmul scheme.

Oracle: exact Python big-int matmul mod q. Covers random + adversarial
extreme-digit patterns (the error-budget corners of kara.py's epilogue).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from openfhe_tpu.ops import kara


def _exact(w, x, q):
    return (w.astype(object) @ x.astype(object)) % int(q)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kara_matmul_random(seed):
    rng = np.random.default_rng(seed)
    q = 132120577            # 27-bit NTT-friendly prime (1023*2^17+1)
    d_dim, a_dim, b_dim = 16, 32, 24
    w = rng.integers(0, q, size=(d_dim, a_dim), dtype=np.uint64)
    x = rng.integers(0, q, size=(a_dim, b_dim), dtype=np.uint64)
    consts = kara.make_kara_consts([q])
    ws = jnp.asarray(kara.kara_w_stack_host(w))
    got = np.asarray(kara.mod_matmul_kara_ref(ws, jnp.asarray(
        x.astype(np.uint32)), consts, 0))
    want = _exact(w, x, q).astype(np.uint64)
    np.testing.assert_array_equal(got.astype(np.uint64), want)


def test_kara_matmul_adversarial_extremes():
    """All-extreme digit patterns maximize |p_s| and the f32 error."""
    q = 132120577
    a_dim = 256              # max contraction used by the NTT kernels
    # extreme representable digit patterns: all +63; alternating -64/+63;
    # and boundary residues
    v_max = 63 * (1 + 128 + 128**2 + 128**3)
    v_alt = (-64 + 63 * 128 - 64 * 128**2 + 63 * 128**3)
    patterns = [v_max % q, v_alt % q, (q - 1), 1, 0,
                63, 63 * 128, 63 * 128**3]
    w = np.zeros((8, a_dim), np.uint64)
    x = np.zeros((a_dim, 8), np.uint64)
    for i, p in enumerate(patterns):
        w[i, :] = p
        x[:, i] = patterns[(i + 3) % len(patterns)]
    consts = kara.make_kara_consts([q])
    ws = jnp.asarray(kara.kara_w_stack_host(w))
    got = np.asarray(kara.mod_matmul_kara_ref(
        ws, jnp.asarray(x.astype(np.uint32)), consts, 0))
    want = _exact(w, x, q).astype(np.uint64)
    np.testing.assert_array_equal(got.astype(np.uint64), want)


def test_kara_limbs_roundtrip():
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1 << 27, size=(64,), dtype=np.uint64)
    l = kara.balanced_limbs128_host(v)
    back = sum(l[i].astype(np.int64) * (128 ** i) for i in range(kara.NDIG))
    np.testing.assert_array_equal(back, v.astype(np.int64))
    # device-side extraction agrees with host
    dl = kara.data_limbs128(jnp.asarray(v.astype(np.uint32)))
    for i in range(kara.NDIG):
        np.testing.assert_array_equal(np.asarray(dl[i]), l[i])


def test_kara_rejects_large_moduli():
    with pytest.raises(ValueError):
        kara.make_kara_consts([1 << 28])
    assert not kara.kara_supported([kara.MAX_MOD + 1])
    assert kara.kara_supported([132120577])
