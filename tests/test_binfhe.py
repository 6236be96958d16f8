"""BinFHE tests: gates, bootstrap refresh, functional bootstrapping.

Reference analog: src/binfhe/unittest/UnitTestFHEW.cpp + UnitTestFunc.cpp —
TOY-parameter round-trip oracles; all four input combinations evaluated as
one batched ciphertext tensor (the TPU-native layout).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from openfhe_tpu.binfhe.constants import BINGATE
from openfhe_tpu.binfhe.context import BinFHEContext


@pytest.fixture(scope="module")
def toy():
    cc = BinFHEContext(seed=3).GenerateBinFHEContext("TOY")
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    m1 = jnp.array([0, 0, 1, 1], jnp.uint32)
    m2 = jnp.array([0, 1, 0, 1], jnp.uint32)
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)
    return cc, sk, m1, m2, ct1, ct2


@pytest.fixture(scope="module")
def func_ctx():
    cc = BinFHEContext(seed=5).GenerateBinFHEContextCustom(
        n=64, N=1024, q=1024, q_bits=27, base_ks=25, base_g=512)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    return cc, sk


GATES = [
    (BINGATE.AND, lambda a, b: a & b),
    (BINGATE.OR, lambda a, b: a | b),
    (BINGATE.NAND, lambda a, b: 1 - (a & b)),
    (BINGATE.XOR, lambda a, b: a ^ b),
]


@pytest.mark.parametrize("gate,fn", GATES, ids=[g.name for g, _ in GATES])
def test_bin_gate(toy, gate, fn):
    cc, sk, m1, m2, ct1, ct2 = toy
    got = cc.Decrypt(sk, cc.EvalBinGate(gate, ct1, ct2))
    want = fn(np.asarray(m1), np.asarray(m2))
    assert np.array_equal(got % 2, want % 2)


def test_not_and_bootstrap(toy):
    cc, sk, m1, m2, ct1, ct2 = toy
    assert np.array_equal(cc.Decrypt(sk, cc.EvalNOT(ct1)),
                          1 - np.asarray(m1))
    refreshed = cc.Bootstrap(ct1)
    assert np.array_equal(cc.Decrypt(sk, refreshed), np.asarray(m1))


def test_three_input_gates(toy):
    cc, sk, m1, m2, ct1, ct2 = toy
    m3 = jnp.array([0, 1, 1, 1], jnp.uint32)
    c1 = cc.Encrypt(sk, m1, p=6)
    c2 = cc.Encrypt(sk, m2, p=6)
    c3 = cc.Encrypt(sk, m3, p=6)
    got = cc.Decrypt(sk, cc.EvalBinGate(BINGATE.AND3, [c1, c2, c3]))
    assert np.array_equal(got, np.asarray(m1) & np.asarray(m2)
                          & np.asarray(m3))
    got = cc.Decrypt(sk, cc.EvalBinGate(BINGATE.OR3, [c1, c2, c3]))
    assert np.array_equal(got, np.asarray(m1) | np.asarray(m2)
                          | np.asarray(m3))


def test_majority_cmux(toy):
    cc, sk, m1, m2, ct1, ct2 = toy
    m3 = jnp.array([0, 1, 1, 1], jnp.uint32)
    ct3 = cc.Encrypt(sk, m3)
    got = cc.Decrypt(sk, cc.EvalBinGate(BINGATE.MAJORITY, [ct1, ct2, ct3]))
    want = (np.asarray(m1) + np.asarray(m2) + np.asarray(m3) >= 2)
    assert np.array_equal(got, want.astype(got.dtype))
    got = cc.Decrypt(sk, cc.EvalCMUX(ct1, ct2, ct3))
    want = np.where(np.asarray(m3), np.asarray(m2), np.asarray(m1))
    assert np.array_equal(got, want)


def test_eval_func(func_ctx):
    cc, sk = func_ctx
    p = 4
    cte = cc.Encrypt(sk, jnp.arange(p, dtype=jnp.uint32), p=p)
    # periodic LUT (x^2 mod 4 repeats with period q/2)
    lut = cc.GenerateLUTviaFunction(lambda m, pp: (m * m) % pp, p)
    got = cc.Decrypt(sk, cc.EvalFunc(cte, lut), p=p)
    assert np.array_equal(got, (np.arange(p) ** 2) % p)
    # arbitrary LUT
    lut2 = cc.GenerateLUTviaFunction(lambda m, pp: m // 2, p)
    got = cc.Decrypt(sk, cc.EvalFunc(cte, lut2), p=p)
    assert np.array_equal(got, np.arange(p) // 2)


def test_eval_sign_decomp(func_ctx):
    cc, sk = func_ctx
    mod = 1 << 17
    ct = cc.Encrypt(sk, jnp.array([2, 60000], jnp.uint32), p=mod // 2, q=mod)
    got = cc.Decrypt(sk, cc.EvalSign(ct), p=2)
    assert np.array_equal(got, [0, 1])
    digits = cc.EvalDecomp(ct)
    assert len(digits) >= 2


def test_ap_accumulator():
    """DM/AP blind rotation (rgsw-acc-dm.cpp) at TOY parameters."""
    from openfhe_tpu.binfhe.constants import BINFHE_METHOD
    cc = BinFHEContext(seed=3).GenerateBinFHEContext("TOY",
                                                     BINFHE_METHOD.AP)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    ct1 = cc.Encrypt(sk, jnp.array([0, 1], jnp.uint32))
    ct2 = cc.Encrypt(sk, jnp.array([1, 1], jnp.uint32))
    got = cc.Decrypt(sk, cc.EvalBinGate(BINGATE.AND, ct1, ct2))
    assert np.array_equal(got, [0, 1])


def test_lmkcdey_accumulator():
    """LMKCDEY automorphism blind rotation (rgsw-acc-lmkcdey.cpp)."""
    from openfhe_tpu.binfhe.constants import BINFHE_METHOD
    cc = BinFHEContext(seed=3).GenerateBinFHEContextCustom(
        n=64, N=1024, q=2048, q_bits=27, base_ks=25, base_g=128,
        method=BINFHE_METHOD.LMKCDEY, num_auto_keys=10)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    m1 = jnp.array([0, 0, 1, 1], jnp.uint32)
    m2 = jnp.array([0, 1, 0, 1], jnp.uint32)
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)
    got = cc.Decrypt(sk, cc.EvalBinGate(BINGATE.AND, ct1, ct2))
    assert np.array_equal(got, np.asarray(m1) & np.asarray(m2))


def test_pubkey_encrypt_roundtrip():
    """Public-key LWE encryption (reference lwe-pke.cpp PubKeyGen/EncryptN +
    binfhecontext.cpp:235): encrypt at (N, Q), switch to (n, q), decrypt
    with the small secret, and run a gate."""
    cc = BinFHEContext()
    cc.GenerateBinFHEContext("TOY", method="GINX")
    sk = cc.KeyGen()
    pk, sk_n = cc.KeyGenPair()
    cc.BTKeyGen(sk)

    bits = np.array([0, 1, 1, 0])
    ct = cc.Encrypt(pk, bits, output="SMALL_DIM")
    dec = cc.Decrypt(sk, ct)
    assert np.array_equal(dec, bits)

    # large-dim ciphertext decrypts under skN
    ct_large = cc.Encrypt(pk, bits, output="LARGE_DIM")
    from openfhe_tpu.binfhe import lwe as _lwe
    assert np.array_equal(_lwe.decrypt(sk_n, ct_large), bits)

    # pk-encrypted inputs drive a gate end-to-end
    a = cc.Encrypt(pk, np.array([0, 0, 1, 1]))
    b = cc.Encrypt(pk, np.array([0, 1, 0, 1]))
    out = cc.EvalBinGate(BINGATE.AND, a, b)
    assert np.array_equal(cc.Decrypt(sk, out), np.array([0, 0, 0, 1]))


def test_lmkcdey_q_not_2n():
    """LMKCDEY with q != 2N (2N/q = 4, the production-paramset shape):
    round-4 regression — the automorphism index must stay UNSCALED
    (reference rgsw-acc-lmkcdey.cpp EvalAcc :82); scaling it by 2N/q
    squares the factor and broke every STD*_LMKCDEY paramset."""
    from openfhe_tpu.binfhe.constants import BINFHE_METHOD
    cc = BinFHEContext(seed=3).GenerateBinFHEContextCustom(
        n=16, N=256, q=128, q_bits=27, base_ks=25, base_g=512,
        method=BINFHE_METHOD.LMKCDEY, num_auto_keys=10)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    m1 = jnp.array([0, 0, 1, 1], jnp.uint32)
    m2 = jnp.array([0, 1, 0, 1], jnp.uint32)
    got = cc.Decrypt(sk, cc.EvalBinGate(BINGATE.AND, cc.Encrypt(sk, m1),
                                        cc.Encrypt(sk, m2)))
    assert np.array_equal(got, np.asarray(m1) & np.asarray(m2))


def test_lmkcdey_scan_matches_host_schedule():
    """The compiled-scan LMKCDEY blind rotation (build_lmkcdey_schedule +
    eval_acc_lmkcdey_scan) is bit-exact vs the host-scheduled oracle
    (eval_acc_lmkcdey) on random accumulators and a-vectors, including a
    q != 2N shape."""
    import jax
    from openfhe_tpu.binfhe import rgsw
    from openfhe_tpu.ops.ntt import ntt_fwd

    rng = np.random.default_rng(11)
    for n, big_n, q, base_g in ((16, 128, 256, 128), (12, 128, 64, 512)):
        from openfhe_tpu.math import nbtheory
        big_q = nbtheory.previous_prime(1 << 27, 2 * big_n)
        params = rgsw.make_rgsw_params(n, big_n, big_q, q, base_g)
        key = jax.random.PRNGKey(5)
        k1, k2, k3 = jax.random.split(key, 3)
        s_lwe = rng.integers(-1, 2, size=n)
        from openfhe_tpu.math import sampling
        sk_n = sampling.to_residues(
            jnp.asarray(rng.integers(-1, 2, size=big_n), jnp.int32),
            params.basis)[0]
        sk_n_eval = ntt_fwd(sk_n[None, None, :], params.basis)[0, 0]
        rgsw_keys = rgsw.keygen_rgsw_monomial(
            k1, params, sk_n_eval, [int(v) for v in s_lwe])
        w = 6
        auto_keys = {0: rgsw.keygen_auto(k2, params, sk_n_eval,
                                         2 * big_n - 5)}
        for j in range(1, w + 1):
            auto_keys[j] = rgsw.keygen_auto(
                jax.random.fold_in(k3, j), params, sk_n_eval,
                pow(5, j, 2 * big_n))

        bank = rgsw.lmkcdey_key_bank(params, rgsw_keys, auto_keys, w)
        perm = jnp.asarray(rgsw.lmkcdey_perm_table(params, w))
        for trial in range(2):
            a_vec = rng.integers(0, q, size=n)
            # acc0 starts at zero in every caller (the scan's initial
            # conjugation step relies on it; see build_lmkcdey_schedule)
            acc0 = jnp.zeros(big_n, jnp.uint32)
            acc1 = jnp.asarray(
                rng.integers(0, big_q, size=big_n).astype(np.uint32))
            ref0, ref1 = rgsw.eval_acc_lmkcdey(
                params, rgsw_keys, auto_keys, w, acc0, acc1, a_vec)
            sched = jnp.asarray(
                rgsw.build_lmkcdey_schedule(params, a_vec, w))
            got0, got1 = rgsw.eval_acc_lmkcdey_scan(
                params, bank, perm, sched, acc0, acc1)
            assert jnp.array_equal(got0, ref0), (n, big_n, q, trial)
            assert jnp.array_equal(got1, ref1), (n, big_n, q, trial)


def test_wide_garner_digits_roundtrip():
    """Composite-Q (2-tower) Garner reconstruction + balanced digit
    extraction: sum(r_j * B^(j+1)) must reconstruct the centered value up
    to the dropped first digit (|err| < B/2), exactly mirroring the
    approximate decomposition contract of rgsw.signed_digit_decompose."""
    from openfhe_tpu.binfhe import rgsw_wide
    params = rgsw_wide.make_rgsw_wide_params(
        n_lwe=8, ring_dim=64, q_bits=34, q_lwe=128, base_g=1 << 7)
    big_q = params.big_q
    assert big_q.bit_length() >= 33
    rng = np.random.default_rng(2)
    x = rng.integers(0, big_q, size=64, dtype=np.int64)
    mods = [int(m) for m in params.basis.moduli]
    res = jnp.asarray(np.stack([x % m for m in mods]).astype(np.uint32))
    hi, lo = rgsw_wide.garner_pair(params, res)
    got = (np.asarray(hi).astype(np.int64) << 32) + np.asarray(lo)
    assert np.array_equal(got, x)
    digits = rgsw_wide.signed_digits_pair(params, hi, lo)
    acc = np.zeros(64, dtype=object)
    b = params.base_g
    for j, r in enumerate(digits):
        acc += np.asarray(r).astype(object) * (b ** (j + 1))
    centered = np.where(x >= big_q // 2, x - big_q, x).astype(object)
    # compare mod Q: a boundary value's top digit may wrap by exactly Q,
    # which the gadget algebra (all mod Q) absorbs
    err = np.array([min(int(d := (a - c) % big_q), big_q - int(d))
                    for a, c in zip(acc, centered)])
    assert err.max() < b // 2 + 1


def test_wide_ginx_gates():
    """Composite-Q GINX end to end at a small custom shape (the STD192
    class runs the same code with Q ~ 2^37; reference rows are
    NATIVE_SIZE=64)."""
    from openfhe_tpu.binfhe.constants import BINFHE_METHOD
    cc = BinFHEContext(seed=5).GenerateBinFHEContextCustom(
        n=16, N=256, q=512, q_bits=34, base_ks=25, base_g=1 << 9,
        method=BINFHE_METHOD.GINX)
    assert cc.wide and cc.Q.bit_length() >= 33
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    m1 = jnp.array([0, 0, 1, 1], jnp.uint32)
    m2 = jnp.array([0, 1, 0, 1], jnp.uint32)
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)
    for gate, fn in ((BINGATE.AND, lambda a, b: a & b),
                     (BINGATE.OR, lambda a, b: a | b),
                     (BINGATE.XOR, lambda a, b: a ^ b)):
        got = cc.Decrypt(sk, cc.EvalBinGate(gate, ct1, ct2))
        want = fn(np.asarray(m1), np.asarray(m2))
        assert np.array_equal(got, want), (gate, got, want)


def test_wide_eval_func():
    """Functional bootstrap through the composite-Q ring (the sweep runs
    EvalFunc x^2 mod 4 at STD192)."""
    from openfhe_tpu.binfhe.constants import BINFHE_METHOD
    cc = BinFHEContext(seed=5).GenerateBinFHEContextCustom(
        n=16, N=512, q=1024, q_bits=34, base_ks=25, base_g=1 << 9,
        method=BINFHE_METHOD.GINX)
    assert cc.wide
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    p = 4
    lut = cc.GenerateLUTviaFunction(lambda m, pp: (m * m) % pp, p)
    ct = cc.Encrypt(sk, np.arange(p, dtype=np.uint32), p=p)
    got = cc.Decrypt(sk, cc.EvalFunc(ct, lut), p=p)
    assert np.array_equal(got, (np.arange(p) ** 2) % p), got


def test_mod_switch_device_exact():
    """Device-side mod switch (float32-estimate + exact pair correction)
    is bit-exact vs the int64 rounding oracle across gate-shaped modulus
    pairs — it runs twice in every gate's hot path, so no host round
    trips and no approximation allowed."""
    from openfhe_tpu.binfhe import lwe
    rng = np.random.default_rng(0)
    for qf, qt in ((134215681, 32768), (134215681, 1024), (32768, 1024),
                   (268369921, 2048), (12289, 512)):
        x = rng.integers(0, qf, size=4096, dtype=np.int64)
        x[:5] = [0, 1, qf - 1, qf // 2, qf // 2 + 1]
        ct = lwe.LWECiphertext(a=jnp.asarray(x.astype(np.uint32)),
                               b=jnp.asarray(x[:1].astype(np.uint32)),
                               modulus=qf, pt_modulus=4)
        got = np.asarray(lwe.mod_switch(qt, ct).a)
        want = ((x * qt * 2 + qf) // (2 * qf)) % qt
        assert np.array_equal(got, want), (qf, qt)


def test_lmkcdey_jitted_scan_with_dense_ntt(monkeypatch):
    """Round-5 TPU-sweep regression: the context's jitted LMKCDEY scan must
    close params OVER the jit (context._lmk_scan) — the small-ring dense
    MXU NTT (ops/ntt_small) builds its transform tables from concrete
    basis values on host, so a traced params pytree raises
    TracerArrayConversionError at every STD*_LMKCDEY paramset on TPU.
    Forcing ntt_small.supported() True reproduces the trace-time table
    build on CPU (the jnp _mat_ref path keeps it runnable here)."""
    from openfhe_tpu.binfhe.constants import BINFHE_METHOD
    from openfhe_tpu.ops import ntt_small

    real_supported = ntt_small.supported
    monkeypatch.setattr(
        ntt_small, "supported",
        lambda b: b.ring_dim >= 128 and len(b.moduli) <= 4
        or real_supported(b))
    cc = BinFHEContext(seed=3).GenerateBinFHEContextCustom(
        n=16, N=256, q=128, q_bits=27, base_ks=25, base_g=512,
        method=BINFHE_METHOD.LMKCDEY, num_auto_keys=10)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    m1 = jnp.array([0, 0, 1, 1], jnp.uint32)
    m2 = jnp.array([0, 1, 0, 1], jnp.uint32)
    got = cc.Decrypt(sk, cc.EvalBinGate(BINGATE.AND, cc.Encrypt(sk, m1),
                                        cc.Encrypt(sk, m2)))
    assert np.array_equal(got, np.asarray(m1) & np.asarray(m2))
