"""Golden-vector interop tests against the compiled reference.

Vectors in tests/vectors/reference_vectors.json were dumped from the
reference implementation built on this machine
(.refbuild/dump_vectors.cpp): negacyclic forward NTT input/output pairs
(ChineseRemainderTransformFTT::ForwardTransformToBitReverse) and
PackedEncoding coefficient vectors.

The NTT check is BIT-EXACT: our transform, built with the reference's
2N-th root, must reproduce the reference's bit-reversed output word for
word (SURVEY.md §7 phase 2 exit criterion).

The PackedEncoding check is exact up to the standard root-of-unity
degree of freedom: any primitive 2N-th root mod t equals zeta_ref^u for
odd u = +-5^s, so decoding the reference's coefficients with our root
yields the reference's slot rows rotated by s (and possibly swapped);
the test recovers (s, swap) and then demands every slot match.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from openfhe_tpu.lattice.basis import make_basis
from openfhe_tpu.ops.ntt import _ntt_fwd_vpu

VEC = os.path.join(os.path.dirname(__file__), "vectors",
                   "reference_vectors.json")


@pytest.fixture(scope="module")
def vectors():
    with open(VEC) as f:
        return json.load(f)


def test_ntt_bit_exact_vs_reference(vectors):
    for case in vectors["ntt"]:
        n, q, root = case["n"], case["q"], case["root"]
        b = make_basis((q,), n, roots=(root,))
        x = jnp.asarray(np.array(case["x"], np.uint32)[None, :])
        got = np.asarray(_ntt_fwd_vpu(x, b))[0]
        want = np.array(case["y_bitrev"], np.uint64)
        np.testing.assert_array_equal(got.astype(np.uint64), want,
                                      err_msg=f"N={n} q={q}")


def test_packed_encoding_matches_reference_up_to_root(vectors):
    from openfhe_tpu.pke.encoding import packed

    for case in vectors["packed"]:
        n, t = case["n"], case["t"]
        slots_ref = np.array(case["slots"], np.int64)
        coeffs = np.array(case["coeffs_mod_t"], np.uint64)
        # decode the reference's coefficient vector with OUR tables
        ours = packed.decode_packed(coeffs, t, n)
        half = n // 2
        ref0, ref1 = slots_ref[:half], slots_ref[half:]
        got0, got1 = ours[:half], ours[half:]
        found = None
        for swap in (False, True):
            a0, a1 = (got1, got0) if swap else (got0, got1)
            for s in range(half):
                if (a0[0] == np.roll(ref0, -s)[0]
                        and np.array_equal(a0, np.roll(ref0, -s))
                        and np.array_equal(a1, np.roll(ref1, -s))):
                    found = (s, swap)
                    break
            if found:
                break
        assert found is not None, f"no orbit alignment found (n={n})"


# ---------------------------------------------------------------------------
# Decrypt transcripts: reference secret key + ciphertext (COEFF residues)
# + decrypted CoefPacked plaintext (tests/vectors/decrypt_transcripts.json,
# dumped by .refbuild/dump_vectors2.cpp). Verifies our CRT reconstruction
# and the BFV round(t/Q * .) / BGV centered-mod-t decrypt math EXACTLY
# against the reference's own arithmetic — no RNG or root dependence
# (CoefPacked slots ARE coefficients).
# ---------------------------------------------------------------------------

TRANS = os.path.join(os.path.dirname(__file__), "vectors",
                     "decrypt_transcripts.json")


def _negacyclic_mul_crt(a_tw, b_tw, moduli):
    """Per-tower negacyclic polymul via host big-int convolution."""
    n = len(a_tw[0])
    out = []
    for a, b, q in zip(a_tw, b_tw, moduli):
        conv = np.convolve(np.array(a, object), np.array(b, object))
        lo, hi = conv[:n], conv[n:]
        full = lo.copy()
        full[:len(hi)] -= hi                     # X^N = -1
        out.append([int(x) % q for x in full])
    return out


@pytest.fixture(scope="module")
def transcripts():
    with open(TRANS) as f:
        return json.load(f)


def _cvs_coeffs(v):
    """Reconstruct centered c0 + c1*s over the big modulus Q."""
    moduli = [int(q) for q in v["moduli"]]
    n = v["n"]
    big_q = 1
    for q in moduli:
        big_q *= q
    c1s = _negacyclic_mul_crt(v["c1"], v["sk"], moduli)
    res = np.array([[(int(v["c0"][t][i]) + int(c1s[t][i])) % moduli[t]
                     for i in range(n)] for t in range(len(moduli))],
                   dtype=object)
    from openfhe_tpu.math import crt
    centered = crt.interpolate_centered(res, moduli)
    return [int(x) for x in centered], big_q


def test_bfv_decrypt_transcript(transcripts):
    v = transcripts["bfv_decrypt"]
    t = v["t"]
    vals, big_q = _cvs_coeffs(v)
    m = [((2 * t * abs(x) + big_q) // (2 * big_q)) % t for x in vals]
    m = [(t - mi) % t if x < 0 else mi for x, mi in zip(vals, m)]
    want = v["plaintext"]
    got = m[:len(want)]
    assert got == want, f"first mismatches: {[(a, b) for a, b in zip(got, want) if a != b][:4]}"


def test_bgv_decrypt_transcript(transcripts):
    v = transcripts["bgv_decrypt"]
    t = v["t"]
    vals, _ = _cvs_coeffs(v)
    m = [x % t for x in vals]
    want = v["plaintext"]
    assert m[:len(want)] == want
