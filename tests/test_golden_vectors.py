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
