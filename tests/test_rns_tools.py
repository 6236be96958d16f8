"""RNS conversion tests vs. exact Python-int CRT oracles.

Reference analog: src/core/unittest/UnitTestDCRTElements.cpp — here the
oracle is exact big-int CRT arithmetic instead of a second C++ backend.
"""
import numpy as np
import jax.numpy as jnp

from openfhe_tpu.lattice.basis import make_basis
from openfhe_tpu.lattice import rns_tools as rt
from openfhe_tpu.lattice.dcrt import Poly, COEFF, EVAL
from openfhe_tpu.lattice import dcrt
from openfhe_tpu.lattice.automorph import eval_indices, coeff_indices
from openfhe_tpu.math import nbtheory
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv

N = 32


def chain(nbits, count, start_order):
    """NTT-friendly moduli chain."""
    q = nbtheory.first_prime(nbits, start_order)
    out = [q]
    for _ in range(count - 1):
        q = nbtheory.next_prime(q, start_order)
        out.append(q)
    return out


def crt_lift(res, moduli):
    """Exact X in [0, prod) from residue matrix [k, N]."""
    big = 1
    for m in moduli:
        big *= m
    out = []
    for j in range(res.shape[1]):
        x = 0
        for i, m in enumerate(moduli):
            h = big // m
            x += int(res[i, j]) * pow(h % m, -1, m) % m * h
        out.append(x % big)
    return out, big


def test_switch_crt_basis_exact():
    b_mods = chain(26, 3, 2 * N)
    d_mods = chain(27, 4, 2 * N)
    bb = make_basis(b_mods, N)
    db = make_basis(d_mods, N)
    tab = rt.make_switch_tables(b_mods, d_mods)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, m, N, dtype=np.uint32) for m in b_mods])
    big_x, big_b = crt_lift(x, b_mods)
    got = np.asarray(rt.switch_crt_basis_exact(jnp.asarray(x), bb, db, tab))
    for j, d in enumerate(d_mods):
        expected = [xx % d for xx in big_x]
        assert got[j].tolist() == expected, f"mismatch in target modulus {d}"


def test_switch_crt_basis_approx_overflow_bounded():
    b_mods = chain(26, 3, 2 * N)
    d_mods = chain(27, 2, 2 * N)
    bb = make_basis(b_mods, N)
    db = make_basis(d_mods, N)
    tab = rt.make_switch_tables(b_mods, d_mods)
    rng = np.random.default_rng(1)
    x = np.stack([rng.integers(0, m, N, dtype=np.uint32) for m in b_mods])
    big_x, big_b = crt_lift(x, b_mods)
    got = np.asarray(rt.switch_crt_basis_approx(jnp.asarray(x), bb, db, tab))
    k = len(b_mods)
    for col in range(N):
        ok = False
        for u in range(k + 1):
            if all(got[j, col] == (big_x[col] + u * big_b) % d
                   for j, d in enumerate(d_mods)):
                ok = True
                break
        assert ok, f"col {col}: no overflow count matches"


def test_drop_last_and_scale():
    mods = chain(28, 3, 2 * N)
    b = make_basis(mods, N)
    tab = rt.make_drop_scale_tables(mods)
    rng = np.random.default_rng(2)
    x = np.stack([rng.integers(0, m, N, dtype=np.uint32) for m in mods])
    big_x, _ = crt_lift(x, mods)
    ql = mods[-1]
    h = ql >> 1
    # oracle per coefficient: floor((X+h)/ql) mod q_i
    out = rt.drop_last_and_scale(Poly(jnp.asarray(x), COEFF), b, tab)
    got = np.asarray(out.data)
    for j, q in enumerate(mods[:-1]):
        exp = [((xx + h) // ql) % q for xx in big_x]
        assert got[j].tolist() == exp
    # and the EVAL path agrees with the COEFF path
    xe = ntt_fwd(jnp.asarray(x), b)
    out_e = rt.drop_last_and_scale(Poly(xe, EVAL), b, tab)
    back = np.asarray(ntt_inv(out_e.data, b.slice(0, 2)))
    assert back.tolist() == got.tolist()


def test_approx_mod_down_recovers_scaled_value():
    q_mods = chain(28, 2, 2 * N)
    p_mods = chain(29, 2, 2 * N)
    qb = make_basis(q_mods, N)
    pb = make_basis(p_mods, N)
    tab = rt.make_mod_down_tables(p_mods, q_mods)
    big_p = p_mods[0] * p_mods[1]
    big_q = q_mods[0] * q_mods[1]
    rng = np.random.default_rng(3)
    z = [int(v) for v in rng.integers(0, big_q, N)]
    e = [int(v) for v in rng.integers(0, 1000, N)]
    big_x = [(zz * big_p + ee) for zz, ee in zip(z, e)]  # < QP
    xq = np.stack([[xx % q for xx in big_x] for q in q_mods]).astype(np.uint32)
    xp = np.stack([[xx % p for xx in big_x] for p in p_mods]).astype(np.uint32)
    got = np.asarray(rt.approx_mod_down(jnp.asarray(xq), jnp.asarray(xp),
                                        qb, pb, tab, fmt=COEFF))
    # result should be z + u for small u (approx error <= k_p + 1)
    for j, q in enumerate(q_mods):
        for col in range(N):
            diff = (int(got[j, col]) - z[col]) % q
            diff = min(diff, q - diff)
            assert diff <= 3, f"tower {j} col {col}: err {diff}"


def test_automorphism_coeff_eval_consistency():
    mods = chain(26, 2, 2 * N)
    b = make_basis(mods, N)
    rng = np.random.default_rng(4)
    x = np.stack([rng.integers(0, m, N, dtype=np.uint32) for m in mods])
    for g in (5, 25, 2 * N - 1):
        ci, cneg = coeff_indices(N, g)
        pc = dcrt.automorphism_coeff(Poly(jnp.asarray(x), COEFF),
                                     jnp.asarray(ci), jnp.asarray(cneg), b)
        via_coeff = ntt_fwd(pc.data, b)
        ei = eval_indices(N, g)
        via_eval = dcrt.automorphism_eval(
            Poly(ntt_fwd(jnp.asarray(x), b), EVAL), jnp.asarray(ei)).data
        assert np.asarray(via_coeff).tolist() == np.asarray(via_eval).tolist(), g
