"""BinFHEContext: the Boolean-FHE user API.

Reference analog: /root/reference src/binfhe/lib/binfhecontext.cpp
(GenerateBinFHEContext :45-181, KeyGen/BTKeyGen :281, Encrypt/Decrypt
:220-235, EvalBinGate :304, Bootstrap :318, EvalNOT :324, EvalFunc :334,
EvalFloor :340, EvalSign :353, EvalDecomp :360) and
binfhe-base-scheme.cpp (EvalBinGate :79, BootstrapGateCore :511).

TPU-first: every op accepts batched ciphertexts (leading axes broadcast
through the whole pipeline, including blind rotation), which is how the
sequential n-step accumulator loop fills the chip.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from openfhe_tpu.binfhe import lwe, rgsw
from openfhe_tpu.binfhe.constants import (BINFHE_METHOD, BINGATE,
                                          KEYGEN_MODE, PARAM_SETS,
                                          PRIME, gate_constants)
from openfhe_tpu.math import modops as mo
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv


class BinFHEContext:
    """(reference BinFHEContext, binfhecontext.h)"""

    def __init__(self, seed: int = 0):
        self._rng = jax.random.PRNGKey(seed)
        self.method = BINFHE_METHOD.GINX
        self.bt_key = None
        self.ks_key = None

    def next_rng(self):
        self._rng, out = jax.random.split(self._rng)
        return out

    # ------------------------------------------------------------------
    # context generation (binfhecontext.cpp:108)
    # ------------------------------------------------------------------

    def GenerateBinFHEContext(self, param_set: str = "STD128",
                              method: BINFHE_METHOD = BINFHE_METHOD.GINX,
                              seed: int | None = None):
        if param_set not in PARAM_SETS:
            raise ValueError(f"unknown parameter set {param_set!r}; "
                             f"choose one of {sorted(PARAM_SETS)}")
        p = PARAM_SETS[param_set]
        if isinstance(method, str):
            method = BINFHE_METHOD[method]
        self.method = method
        self.n = p.lattice_param
        self.N = p.cyc_order // 2
        self.q = p.mod
        self.std = p.std_dev
        self.base_ks = p.base_ks
        from openfhe_tpu.math import nbtheory
        self.wide = p.number_bits > 31
        if self.wide:
            # STD192-class sets need Q beyond 32-bit lanes: composite
            # 2-tower RNS ring (rgsw_wide; reference runs these rows on
            # NATIVE_SIZE=64 words)
            if method != BINFHE_METHOD.GINX:
                raise ValueError(
                    f"{param_set} needs a {p.number_bits}-bit accumulator "
                    "modulus; only GINX supports the composite-Q wide "
                    "ring on 32-bit device words (AP/LMKCDEY: use a "
                    "paramset with Q < 2^31, e.g. STD256_LMKCDEY)")
            from openfhe_tpu.binfhe import rgsw_wide
            self.rgsw_w = rgsw_wide.make_rgsw_wide_params(
                self.n, self.N, p.number_bits, self.q, p.base_g)
            self.Q = self.rgsw_w.big_q
            self.rgsw = None
        else:
            # LastPrime(bits, 2N): largest `bits`-bit prime = 1 mod 2N
            self.Q = nbtheory.previous_prime(1 << p.number_bits,
                                             p.cyc_order)
            self.rgsw = rgsw.make_rgsw_params(self.n, self.N, self.Q,
                                              self.q, p.base_g)
        self.q_ks = self.Q if p.mod_ks == PRIME else p.mod_ks
        self.base_r = p.base_rk
        self.num_auto_keys = p.num_auto_keys
        self.gate_const = gate_constants(self.q)
        return self

    def GenerateBinFHEContextCustom(self, n: int, N: int, q: int,
                                    q_bits: int, base_ks: int, base_g: int,
                                    std: float = 3.19,
                                    method: BINFHE_METHOD =
                                    BINFHE_METHOD.GINX,
                                    base_r: int = 23,
                                    num_auto_keys: int = 10):
        """Fully-custom context (reference GenerateBinFHEContext overload,
        binfhecontext.cpp:45). Use for experiments/tests; the named
        parameter sets carry the published security estimates."""
        from openfhe_tpu.math import nbtheory
        if isinstance(method, str):
            method = BINFHE_METHOD[method]
        self.method = method
        self.n, self.N, self.q, self.std = n, N, q, std
        self.base_ks = base_ks
        self.base_r = base_r
        self.num_auto_keys = num_auto_keys
        self.wide = q_bits > 31
        if self.wide:
            if method != BINFHE_METHOD.GINX:
                raise ValueError("composite-Q (q_bits > 31) supports GINX "
                                 "only")
            from openfhe_tpu.binfhe import rgsw_wide
            self.rgsw_w = rgsw_wide.make_rgsw_wide_params(n, N, q_bits, q,
                                                          base_g)
            self.Q = self.rgsw_w.big_q
            self.rgsw = None
            self.q_ks = 1 << max(10, q_bits // 2 - 4)
        else:
            self.Q = nbtheory.previous_prime(1 << q_bits, 2 * N)
            self.q_ks = self.Q
            self.rgsw = rgsw.make_rgsw_params(n, N, self.Q, q, base_g)
        self.gate_const = gate_constants(q)
        return self

    # ------------------------------------------------------------------
    # keys
    # ------------------------------------------------------------------

    def KeyGen(self) -> lwe.LWEPrivateKey:
        self.sk = lwe.key_gen(self.next_rng(), self.n)
        return self.sk

    def KeyGenPair(self):
        """(binfhecontext.cpp:210) -> (pk, skN) at ring dimension N mod Q;
        BTKeyGen afterwards reuses this skN so pk-encrypted ciphertexts
        switch onto the bootstrap path."""
        self.sk_n = lwe.key_gen(self.next_rng(), self.N)
        pk = lwe.pub_key_gen(self.next_rng(), self.sk_n, self.Q)
        return pk, self.sk_n

    def PubKeyGen(self, sk_n: lwe.LWEPrivateKey) -> lwe.LWEPublicKey:
        """(binfhecontext.cpp:214)"""
        return lwe.pub_key_gen(self.next_rng(), sk_n, self.Q)

    def GetPublicKey(self) -> lwe.LWEPublicKey:
        """(binfhecontext.h:171) — the pk stored by BTKeyGen(PUB_ENCRYPT)."""
        pk = getattr(self, "pk", None)
        if pk is None:
            raise ValueError("no public key: call BTKeyGen(sk, "
                             "keygen_mode=KEYGEN_MODE.PUB_ENCRYPT) first")
        return pk

    def BTKeyGen(self, sk: lwe.LWEPrivateKey,
                 keygen_mode=KEYGEN_MODE.SYM_ENCRYPT) -> None:
        """(binfhe-base-scheme.cpp BTKeyGen :40): KS key + blind-rotation
        key for the ring secret, per the configured method. With
        keygen_mode=PUB_ENCRYPT a public key for the ring secret is also
        generated and stored (binfhecontext.h:273 default SYM_ENCRYPT)."""
        sk_n = getattr(self, "sk_n", None)
        if sk_n is None:
            sk_n = lwe.key_gen(self.next_rng(), self.N)
            self.sk_n = sk_n
        if getattr(self, "wide", False):
            if keygen_mode == KEYGEN_MODE.PUB_ENCRYPT:
                raise ValueError("public-key workflows are not supported "
                                 "on composite-Q (wide) paramsets yet")
            from openfhe_tpu.binfhe import rgsw_wide
            from openfhe_tpu.math import sampling as _sampling
            bw = self.rgsw_w.basis
            sk_res = _sampling.to_residues(
                jnp.asarray(np.asarray(sk_n.s), jnp.int32), bw)
            sk_n_eval = ntt_fwd(sk_res, bw)
            self.ks_key = lwe.key_switch_gen(self.next_rng(), sk, sk_n,
                                             self.q_ks, self.base_ks,
                                             self.std)
            self.bt_key = rgsw_wide.keygen_cggi_pair_wide(
                self.next_rng(), self.rgsw_w, sk_n_eval, sk.s, self.std)
            return
        b = self.rgsw.basis
        if keygen_mode == KEYGEN_MODE.PUB_ENCRYPT:
            self.pk = lwe.pub_key_gen(self.next_rng(), sk_n, self.Q)
        sk_n_res = jnp.asarray(
            (np.asarray(sk_n.s) % self.Q).astype(np.uint32))[None, :]
        sk_n_eval = ntt_fwd(sk_n_res[None, :, :], b)[0, 0]
        self.ks_key = lwe.key_switch_gen(self.next_rng(), sk, sk_n,
                                         self.q_ks, self.base_ks, self.std)
        if self.method == BINFHE_METHOD.GINX:
            self.bt_key = rgsw.keygen_cggi_pair(self.next_rng(), self.rgsw,
                                                sk_n_eval, sk.s, self.std)
        elif self.method == BINFHE_METHOD.AP:
            self.bt_key = rgsw.keygen_dm(self.next_rng(), self.rgsw,
                                         sk_n_eval, sk.s,
                                         getattr(self, "base_r", 23),
                                         self.std)
        else:   # LMKCDEY
            s_host = np.asarray(sk.s, np.int64)
            rgsw_keys = rgsw.keygen_rgsw_monomial(
                self.next_rng(), self.rgsw, sk_n_eval,
                [int(v) for v in s_host], self.std)
            w = getattr(self, "num_auto_keys", 10)
            auto_keys = {0: rgsw.keygen_auto(self.next_rng(), self.rgsw,
                                             sk_n_eval, 2 * self.N - 5,
                                             self.std)}
            for j in range(1, w + 1):
                auto_keys[j] = rgsw.keygen_auto(
                    self.next_rng(), self.rgsw, sk_n_eval,
                    pow(5, j, 2 * self.N), self.std)
            # unified key bank + permutation table: blind rotation runs as
            # ONE compiled lax.scan over a host-precomputed schedule
            # (rgsw.build_lmkcdey_schedule) — batchable across gates
            self.bt_key = (
                rgsw.lmkcdey_key_bank(self.rgsw, rgsw_keys, auto_keys, w),
                jnp.asarray(rgsw.lmkcdey_perm_table(self.rgsw, w)),
                w)
            self._lmk_scan_cache = {}

    def _lmk_scan(self, params, key_bank, perm_table, sched, c0, c1):
        """Jitted LMKCDEY scan with params CLOSED OVER (not traced): the
        small-ring MXU NTT (ops/ntt_small.py) builds its dense transform
        tables from concrete basis values on host, so params.basis must be
        a trace-time constant, not a traced pytree argument."""
        fn = self._lmk_scan_cache.get(params.q_lwe)
        if fn is None:
            fn = jax.jit(lambda kb, pt, s, a0, a1:
                         rgsw.eval_acc_lmkcdey_scan(params, kb, pt, s,
                                                    a0, a1))
            self._lmk_scan_cache[params.q_lwe] = fn
        return fn(key_bank, perm_table, sched, c0, c1)

    def _eval_acc(self, acc0, acc1, a, q_lwe: int | None = None):
        """Dispatch blind rotation on the configured method."""
        params = self.rgsw if q_lwe is None \
            else self.rgsw.replace(q_lwe=q_lwe)
        if self.method == BINFHE_METHOD.GINX:
            return rgsw.eval_acc_cggi(params, self.bt_key, acc0, acc1, a)
        if self.method == BINFHE_METHOD.AP:
            ek, digits_r = self.bt_key
            return rgsw.eval_acc_dm(params, ek, digits_r,
                                    getattr(self, "base_r", 23),
                                    acc0, acc1, a)
        # LMKCDEY: host-precomputed per-gate schedules (a pure function of
        # the public a vector), padded to a shared bucketed length and run
        # as ONE compiled scan — gates batch just like GINX
        key_bank, perm_table, w = self.bt_key
        a_host = np.asarray(a, np.int64)
        lead = a_host.shape[:-1]
        a2 = a_host.reshape(-1, a_host.shape[-1])
        scheds = [rgsw.build_lmkcdey_schedule(params, row, w) for row in a2]
        lmax = max(s.shape[0] for s in scheds)
        lmax = -(-lmax // 128) * 128            # bucket: few jit variants
        sched = np.stack([
            np.concatenate([s, np.tile(rgsw.LMK_NOOP,
                                       (lmax - s.shape[0], 1))])
            for s in scheds])                   # [B, L, 5]
        sched = jnp.asarray(np.ascontiguousarray(sched.transpose(1, 0, 2)))
        big_n = self.N
        c0 = jnp.broadcast_to(acc0, lead + (big_n,)).reshape(-1, big_n)
        c1 = jnp.broadcast_to(acc1, lead + (big_n,)).reshape(-1, big_n)
        if not lead:                            # single gate: no batch axis
            c0, c1 = c0[0], c1[0]
            sched = sched[:, 0]
        o0, o1 = self._lmk_scan(params, key_bank, perm_table, sched, c0, c1)
        return o0.reshape(lead + (big_n,)), o1.reshape(lead + (big_n,))

    # ------------------------------------------------------------------
    # encryption
    # ------------------------------------------------------------------

    def Encrypt(self, sk, m, p: int = 4, q: int | None = None,
                output: str = "SMALL_DIM") -> lwe.LWECiphertext:
        """Secret-key or public-key encryption (binfhecontext.cpp:220/:235).
        With a public key the ciphertext is produced at (N, Q) and, for
        SMALL_DIM output, switched down to (n, q) through the BTKeyGen
        switching key."""
        if isinstance(sk, lwe.LWEPublicKey):
            # pk lives mod Q: always encrypt at (N, Q); a custom target q
            # is reached through the switch-down (lwe-pke.cpp:153)
            ct = lwe.encrypt_pub(self.next_rng(), sk, m, self.Q, p,
                                 self.std)
            if output == "SMALL_DIM":
                if getattr(self, "ks_key", None) is None:
                    raise ValueError("public-key SMALL_DIM encryption needs "
                                     "BTKeyGen first (switching key)")
                ct = lwe.switch_ct_to_qn(self.ks_key, q or self.q, ct)
                ct = ct.replace(pt_modulus=p)
            return ct
        return lwe.encrypt(self.next_rng(), sk, m, q or self.q, p, self.std)

    def Decrypt(self, sk: lwe.LWEPrivateKey, ct: lwe.LWECiphertext,
                p: int | None = None):
        if p is not None and p != ct.pt_modulus:
            ct = ct.replace(pt_modulus=p)
        return lwe.decrypt(sk, ct)

    def EvalNOT(self, ct: lwe.LWECiphertext) -> lwe.LWECiphertext:
        return lwe.eval_not(ct)

    def EvalConstant(self, value) -> lwe.LWECiphertext:
        return lwe.noiseless_embedding(self.n, value, self.q)

    # ------------------------------------------------------------------
    # gate bootstrapping (binfhe-base-scheme.cpp:79-135, :511)
    # ------------------------------------------------------------------

    def _test_vector(self, b, gate: BINGATE, p: int = 4):
        """Gate-dependent test polynomial in COEFF, batched over b [...]."""
        q, big_q, big_n = self.q, self.Q, self.N
        q_half = q >> 1
        q1 = self.gate_const[int(gate)]
        q2 = (q1 + q_half) % q
        lb, ub, swap = (q2, q1, True) if q1 >= q2 else (q1, q2, False)
        q2p = big_q // (p * 2) + 1
        lv, uv = (q2p, big_q - q2p) if swap else (big_q - q2p, q2p)
        factor = big_n // q_half
        # row i (i < q/2): value depends on (b - i) mod q in [lb, ub)
        i_idx = jnp.arange(q_half, dtype=jnp.uint32)
        bi = mo.sub_mod(b[..., None], i_idx, jnp.uint32(q))
        inside = (bi >= lb) & (bi < ub)
        vals = jnp.where(inside, jnp.uint32(lv), jnp.uint32(uv))
        m = jnp.zeros(b.shape + (big_n,), jnp.uint32)
        m = m.at[..., ::factor].set(vals)
        return m

    def _test_vector_wide(self, b, gate: BINGATE, p: int = 4):
        """Wide (composite-Q) gate test polynomial: values live as
        2-tower residues [..., 2, N] COEFF."""
        q, big_q, big_n = self.q, self.Q, self.N
        q_half = q >> 1
        q1 = self.gate_const[int(gate)]
        q2 = (q1 + q_half) % q
        lb, ub, swap = (q2, q1, True) if q1 >= q2 else (q1, q2, False)
        q2p = big_q // (p * 2) + 1
        lv, uv = (q2p, big_q - q2p) if swap else (big_q - q2p, q2p)
        factor = big_n // q_half
        i_idx = jnp.arange(q_half, dtype=jnp.uint32)
        bi = mo.sub_mod(b[..., None], i_idx, jnp.uint32(q))
        inside = (bi >= lb) & (bi < ub)                  # [..., q/2]
        mods = [int(m) for m in self.rgsw_w.basis.moduli]
        m = jnp.zeros(b.shape + (2, big_n), jnp.uint32)
        for t, qi in enumerate(mods):
            vals = jnp.where(inside, jnp.uint32(lv % qi),
                             jnp.uint32(uv % qi))
            m = m.at[..., t, ::factor].set(vals)
        return m

    def _extract_and_switch_wide(self, acc0, acc1, extra_b: int, p: int,
                                 to_q: int | None = None):
        """INTT the accumulator, Garner-reconstruct mod Q on host, build
        the transposed LWE sample, add `extra_b`, and switch to (n, q)."""
        from openfhe_tpu.binfhe import rgsw_wide
        params = self.rgsw_w
        bw = params.basis
        big_q, big_n = self.Q, self.N
        p0 = ntt_inv(acc0, bw)
        p1 = ntt_inv(acc1, bw)
        h0, l0 = rgsw_wide.garner_pair(params, p0)
        h1, l1 = rgsw_wide.garner_pair(params, p1)
        a_int = (np.asarray(h0).astype(np.int64) << 32) \
            + np.asarray(l0).astype(np.int64)
        b_int = (np.asarray(h1).astype(np.int64) << 32) \
            + np.asarray(l1).astype(np.int64)
        rev = np.concatenate([[0], np.arange(big_n - 1, 0, -1)])
        a_t = a_int[..., rev].copy()
        a_t[..., 1:] = (big_q - a_t[..., 1:]) % big_q
        bb = (b_int[..., 0] + extra_b) % big_q
        ct = lwe.LWECiphertext(a=a_t, b=bb, modulus=big_q, pt_modulus=p)
        return lwe.switch_ct_to_qn(self.ks_key, to_q or self.q, ct)

    def _bootstrap_core_wide(self, ct, gate: BINGATE, p: int,
                             extra_b: int):
        from openfhe_tpu.binfhe import rgsw_wide
        params = self.rgsw_w.replace(q_lwe=int(ct.modulus))
        bw = params.basis
        m = self._test_vector_wide(ct.b, gate, p)
        acc1 = ntt_fwd(m, bw)
        acc0 = jnp.zeros_like(acc1)
        acc0, acc1 = rgsw_wide.eval_acc_cggi_wide(params, self.bt_key,
                                                  acc0, acc1, ct.a)
        return self._extract_and_switch_wide(acc0, acc1, extra_b,
                                             p).replace(pt_modulus=p)

    def _bootstrap_core(self, ct, gate: BINGATE, p: int = 4):
        """Init accumulator with the test vector, run blind rotation,
        extract the constant coefficient as an LWE sample mod Q."""
        if self.bt_key is None:
            raise ValueError("bootstrapping keys have not been generated; "
                             "call BTKeyGen before gate evaluation")
        b = self.rgsw.basis
        m = self._test_vector(ct.b, gate, p)
        acc1 = ntt_fwd(m[..., None, :], b)[..., 0, :]
        acc0 = jnp.zeros_like(acc1)
        acc0, acc1 = self._eval_acc(acc0, acc1, ct.a)
        # extract: a = Transpose(acc0) in COEFF, b = acc1[0]
        p0 = ntt_inv(acc0[..., None, :], b)[..., 0, :]
        p1 = ntt_inv(acc1[..., None, :], b)[..., 0, :]
        # Transpose: a(X) -> a(X^-1): a'_0 = a_0, a'_k = -a_{N-k}
        big_q = self.Q
        rev = jnp.concatenate([jnp.arange(1), jnp.arange(self.N - 1, 0, -1)])
        a_t = jnp.take(p0, rev, axis=-1)
        sign_flip = jnp.arange(self.N) > 0
        a_t = jnp.where(sign_flip, mo.neg_mod(a_t, jnp.uint32(big_q)), a_t)
        return lwe.LWECiphertext(a=a_t, b=p1[..., 0], modulus=big_q,
                                 pt_modulus=p)

    def EvalBinGate(self, gate: BINGATE, ct1, ct2=None) -> lwe.LWECiphertext:
        """(binfhe-base-scheme.cpp EvalBinGate :79 two-input, :135
        multi-input). ct1 may be a list of >= 3 ciphertexts."""
        if ct2 is None and isinstance(ct1, (list, tuple)):
            return self._eval_multi_gate(gate, list(ct1))
        cts = []
        for c in (ct1, ct2):
            if c.modulus == self.Q:
                c = lwe.switch_ct_to_qn(self.ks_key, self.q, c)
            cts.append(c)
        cct = lwe.eval_add(cts[0], cts[1])
        if gate in (BINGATE.XOR, BINGATE.XNOR, BINGATE.XOR_FAST,
                    BINGATE.XNOR_FAST):
            cct = lwe.eval_add(cct, cct)
        if getattr(self, "wide", False):
            return self._bootstrap_core_wide(
                cct, gate, 4, extra_b=(self.Q >> 3) + 1)
        ct_ext = self._bootstrap_core(cct, gate)
        # map back to mod-2 arithmetic: b += Q/8 + 1 (p = 4)
        bq = jnp.uint32(self.Q)
        ct_ext = ct_ext.replace(
            b=mo.add_mod(ct_ext.b, jnp.uint32((self.Q >> 3) + 1), bq))
        return lwe.switch_ct_to_qn(self.ks_key, self.q, ct_ext)

    def _eval_multi_gate(self, gate: BINGATE, cts) -> lwe.LWECiphertext:
        """3/4-input gates and MAJORITY (binfhe-base-scheme.cpp :147);
        CMUX composed from NANDs (:178)."""
        if gate == BINGATE.CMUX:
            if len(cts) != 3:
                raise ValueError("CMUX takes exactly 3 ciphertexts")
            return self.EvalCMUX(cts[0], cts[1], cts[2])
        cts = [lwe.switch_ct_to_qn(self.ks_key, self.q, c)
               if c.modulus == self.Q else c for c in cts]
        acc = cts[0]
        for c in cts[1:]:
            acc = lwe.eval_add(acc, c)
        p = cts[0].pt_modulus
        if getattr(self, "wide", False):
            return self._bootstrap_core_wide(
                acc, gate, p, extra_b=self.Q // (2 * p) + 1)
        ct_ext = self._bootstrap_core(acc, gate, p)
        bq = jnp.uint32(self.Q)
        ct_ext = ct_ext.replace(
            b=mo.add_mod(ct_ext.b, jnp.uint32(self.Q // (2 * p) + 1), bq))
        return lwe.switch_ct_to_qn(self.ks_key, self.q,
                                   ct_ext).replace(pt_modulus=p)

    def EvalCMUX(self, ct0, ct1, sel) -> lwe.LWECiphertext:
        """sel ? ct1 : ct0 via three NANDs (binfhe-base-scheme.cpp :181)."""
        n1 = self.EvalBinGate(BINGATE.NAND, ct0, self.EvalNOT(sel))
        n2 = self.EvalBinGate(BINGATE.NAND, ct1, sel)
        return self.EvalBinGate(BINGATE.NAND, n1, n2)

    def Bootstrap(self, ct) -> lwe.LWECiphertext:
        """Noise refresh of a single ciphertext (binfhe-base-scheme.cpp
        Bootstrap :318): add q/4, run the AND test polynomial, re-center."""
        if ct.modulus == self.Q:
            ct = lwe.switch_ct_to_qn(self.ks_key, self.q, ct)
        p = ct.pt_modulus
        cct = ct.replace(b=mo.add_mod(ct.b, jnp.uint32(ct.modulus >> 2),
                                      jnp.uint32(ct.modulus)))
        if getattr(self, "wide", False):
            return self._bootstrap_core_wide(
                cct, BINGATE.AND, p, extra_b=self.Q // (2 * p) + 1)
        ct_ext = self._bootstrap_core(cct, BINGATE.AND, p)
        bq = jnp.uint32(self.Q)
        ct_ext = ct_ext.replace(
            b=mo.add_mod(ct_ext.b, jnp.uint32(self.Q // (2 * p) + 1), bq))
        return lwe.switch_ct_to_qn(self.ks_key, self.q,
                                   ct_ext).replace(pt_modulus=p)

    # ------------------------------------------------------------------
    # functional bootstrapping (binfhe-base-scheme.cpp BootstrapFunc*,
    # EvalFunc :261-345)
    # ------------------------------------------------------------------

    @property
    def beta(self) -> int:
        """Noise margin added before functional bootstraps
        (binfhecontext.h GetBeta = 128)."""
        return 128

    def GetMaxPlaintextSpace(self) -> int:
        return self.q // (self.beta << 1)

    def GenerateLUTviaFunction(self, f, p: int) -> np.ndarray:
        """(binfhecontext.cpp GenerateLUTviaFunction): LUT over Z_q with
        entries (q/p) * f(x/(q/p), p)."""
        q = self.q
        lut = np.zeros(q, np.int64)
        for i in range(q):
            v = int(f((i * p) // q, p))
            if v >= p:
                raise ValueError("function must output in Z_p")
            lut[i] = (q // p) * v
        return lut

    def _bootstrap_func(self, ct, fv_q: np.ndarray, fmod: int,
                        out_mod: int | None = None) -> lwe.LWECiphertext:
        """BootstrapFunc: blind-rotate with test vector Q/fmod * f(b - j),
        then ModSwitch -> KeySwitch -> ModSwitch(fmod).

        fv_q: host LUT over Z_{ct.modulus} with values already in Z_fmod.
        """
        if self.bt_key is None:
            raise ValueError("bootstrapping keys have not been generated; "
                             "call BTKeyGen before functional bootstraps")
        if getattr(self, "wide", False):
            return self._bootstrap_func_wide(ct, fv_q, fmod, out_mod)
        q_ct, big_q, big_n = ct.modulus, self.Q, self.N
        factor = (2 * big_n) // q_ct
        scale = big_q // fmod
        fv = jnp.asarray((fv_q.astype(np.int64) % fmod) * scale % big_q
                         ).astype(jnp.uint32)
        q_half = q_ct >> 1
        bi = mo.sub_mod(ct.b[..., None],
                        jnp.arange(q_half, dtype=jnp.uint32),
                        jnp.uint32(q_ct))
        vals = jnp.take(fv, bi, axis=-1)
        m = jnp.zeros(ct.b.shape + (big_n,), jnp.uint32)
        m = m.at[..., ::factor].set(vals)
        b = self.rgsw.basis
        acc1 = ntt_fwd(m[..., None, :], b)[..., 0, :]
        acc0 = jnp.zeros_like(acc1)
        # blind rotation indices use the ciphertext modulus of `ct`
        acc0, acc1 = self._eval_acc(acc0, acc1, ct.a, q_lwe=q_ct)
        p0 = ntt_inv(acc0[..., None, :], b)[..., 0, :]
        p1 = ntt_inv(acc1[..., None, :], b)[..., 0, :]
        rev = jnp.concatenate([jnp.arange(1), jnp.arange(big_n - 1, 0, -1)])
        a_t = jnp.take(p0, rev, axis=-1)
        a_t = jnp.where(jnp.arange(big_n) > 0,
                        mo.neg_mod(a_t, jnp.uint32(big_q)), a_t)
        ct_ext = lwe.LWECiphertext(a=a_t, b=p1[..., 0], modulus=big_q,
                                   pt_modulus=ct.pt_modulus)
        return lwe.switch_ct_to_qn(self.ks_key, out_mod or fmod, ct_ext)

    def _bootstrap_func_wide(self, ct, fv_q: np.ndarray, fmod: int,
                             out_mod: int | None = None):
        """Composite-Q variant of _bootstrap_func: the LUT test vector is
        built directly in 2-tower residues."""
        from openfhe_tpu.binfhe import rgsw_wide
        q_ct, big_q, big_n = int(ct.modulus), self.Q, self.N
        params = self.rgsw_w.replace(q_lwe=q_ct)
        bw = params.basis
        factor = (2 * big_n) // q_ct
        scale = big_q // fmod
        fv_int = (fv_q.astype(object) % fmod) * scale % big_q
        q_half = q_ct >> 1
        bi = mo.sub_mod(ct.b[..., None],
                        jnp.arange(q_half, dtype=jnp.uint32),
                        jnp.uint32(q_ct))
        mods = [int(m) for m in bw.moduli]
        m = jnp.zeros(ct.b.shape + (2, big_n), jnp.uint32)
        for t, qi in enumerate(mods):
            fv_t = jnp.asarray(
                np.array([int(v) % qi for v in fv_int], np.uint32))
            vals = jnp.take(fv_t, bi, axis=-1)
            m = m.at[..., t, ::factor].set(vals)
        acc1 = ntt_fwd(m, bw)
        acc0 = jnp.zeros_like(acc1)
        acc0, acc1 = rgsw_wide.eval_acc_cggi_wide(params, self.bt_key,
                                                  acc0, acc1, ct.a)
        return self._extract_and_switch_wide(acc0, acc1, 0,
                                             ct.pt_modulus,
                                             to_q=out_mod or fmod)

    @staticmethod
    def _check_input_function(lut: np.ndarray, q: int) -> int:
        """0 = negacyclic, 1 = periodic, 2 = arbitrary
        (binfhe-base-scheme.h checkInputFunction)."""
        half = q // 2
        if np.all((lut[:half] + lut[half:]) % q == 0):
            return 0
        if np.all(lut[:half] == lut[half:]):
            return 1
        return 2

    def EvalFunc(self, ct, lut) -> lwe.LWECiphertext:
        """Arbitrary-function evaluation via functional bootstrapping
        (binfhe-base-scheme.cpp EvalFunc :261).

        The working modulus is the CIPHERTEXT's (EvalFunc :253), not the
        context default — callers may hand in a ct at a boosted q."""
        q = int(ct.modulus)
        lut = np.asarray(lut, np.int64)
        if lut.shape[0] != q:
            raise ValueError(f"LUT length {lut.shape[0]} != ciphertext "
                             f"modulus {q}; generate the LUT for the "
                             "modulus the ciphertext lives at")
        prop = self._check_input_function(lut, q)
        beta = self.beta
        qq = jnp.uint32(q)
        p = ct.pt_modulus

        if prop == 0:       # negacyclic: a single bootstrap
            ct1 = ct.replace(b=mo.add_mod(ct.b, jnp.uint32(beta), qq))
            return self._bootstrap_func(ct1, lut, q).replace(pt_modulus=p)

        if prop == 2:       # arbitrary: raise modulus q -> 2q
            if q > self.N:
                raise ValueError("q must be <= N for arbitrary functions")
            dq = 2 * q
            dqq = jnp.uint32(dq)
            # ct viewed mod 2q (values unchanged)
            ct1 = ct.replace(modulus=dq)
            ct2 = ct1.replace(b=mo.add_mod(ct1.b, jnp.uint32(beta), dqq))
            # f0: map to +-q/4 depending on the half of Z_2q
            x = np.arange(dq, dtype=np.int64)
            f0 = np.where(x < q, dq - (q >> 1), (q >> 1)).astype(np.int64)
            ct3 = self._bootstrap_func(ct2, f0, dq)
            ct1 = lwe.eval_sub(ct1, ct3)
            ct3b = ct1.replace(
                b=mo.sub_mod(mo.add_mod(ct1.b, jnp.uint32(beta), dqq),
                             jnp.uint32(q >> 1), dqq))
            # now the input lies in [0, q); evaluate the doubled LUT
            lut2 = np.concatenate([lut, lut])
            fl = np.where(x < q, lut2[x], (dq - lut2[x - q]) % dq)
            ct4 = self._bootstrap_func(ct3b, fl, dq)
            # reinterpret mod q
            return ct4.replace(
                a=mo.barrett_u32(ct4.a, qq, jnp.uint32((1 << 32) // q)),
                b=mo.barrett_u32(ct4.b, qq, jnp.uint32((1 << 32) // q)),
                modulus=q, pt_modulus=p)

        # periodic: compose two bootstraps (reference :330-345)
        ct1 = ct.replace(b=mo.add_mod(ct.b, jnp.uint32(beta), qq))
        x = np.arange(q, dtype=np.int64)
        f0 = np.where(x < (q >> 1), q - (q >> 2), (q >> 2)).astype(np.int64)
        ct2 = self._bootstrap_func(ct1, f0, q)
        ct2 = lwe.eval_sub(ct, ct2)      # original ct, without the beta shift
        ct2 = ct2.replace(b=mo.sub_mod(
            mo.add_mod(ct2.b, jnp.uint32(beta), qq), jnp.uint32(q >> 2), qq))
        fl = np.where(x < (q >> 1), lut[x], (q - lut[(x - (q >> 1)) % q]) % q)
        out = self._bootstrap_func(ct2, fl, q)
        return out.replace(pt_modulus=p)

    # ------------------------------------------------------------------
    # large-precision ops (binfhe-base-scheme.cpp :334-490,
    # eprint 2021/1337)
    # ------------------------------------------------------------------

    def EvalFloor(self, ct, round_bits: int = 0) -> lwe.LWECiphertext:
        """Clear the low log2(q) bits of a large-modulus ciphertext
        (binfhe-base-scheme.cpp EvalFloor :335)."""
        beta = self.beta
        q = self.q if round_bits == 0 else beta * (1 << (round_bits + 1))
        mod = ct.modulus
        modq = jnp.uint32(mod)
        ct1 = ct.replace(b=mo.add_mod(ct.b, jnp.uint32(beta), modq))
        x = np.arange(q, dtype=np.int64)

        # f1: +-q/4 by the half of Z_q (values live in Z_mod)
        f1 = np.where(x < (q >> 1), mod - (q >> 2), (q >> 2)).astype(np.int64)
        ct1_q = ct1.replace(a=ct1.a % q, b=ct1.b % q, modulus=q)
        ct2 = self._bootstrap_func(ct1_q, f1, mod)
        ct1 = lwe.eval_sub(ct1, ct2)

        # f2: identity-ish on [q/4, 3q/4), reflected outside
        f2 = np.where(
            x < (q >> 2), (mod - (q >> 1) - x) % mod,
            np.where(x < 3 * (q >> 2), x, (mod + (q >> 1) - x) % mod)
        ).astype(np.int64)
        ct2_q = ct1.replace(a=ct1.a % q, b=ct1.b % q, modulus=q)
        ct3 = self._bootstrap_func(ct2_q, f2, mod)
        return lwe.eval_sub(ct1, ct3)

    def EvalSign(self, ct, scheme_switch: bool = False) -> lwe.LWECiphertext:
        """Large-precision sign via iterated flooring
        (binfhe-base-scheme.cpp EvalSign :380). With scheme_switch=True,
        uses the negated final map and skips the q/4 recentering (the
        encoding EvalFHEWtoCKKS expects, reference :440-447)."""
        beta = self.beta
        q = self.q
        mod = ct.modulus
        if mod <= q:
            raise ValueError("EvalSign is for large-precision inputs; use "
                             "Bootstrap for small precision")
        cttmp = ct
        while mod > q:
            cttmp = self.EvalFloor(cttmp)
            mod = (mod * 2 * beta) // q
            cttmp = lwe.mod_switch(mod, cttmp)
        cttmp = cttmp.replace(
            b=mo.add_mod(cttmp.b, jnp.uint32(beta), jnp.uint32(mod)))
        x = np.arange(mod, dtype=np.int64)
        if scheme_switch:
            f3 = np.where(x < mod // 2, (q - q // 4) % q,
                          q // 4).astype(np.int64)
            out = self._bootstrap_func(cttmp, f3, q)
            return out.replace(pt_modulus=4)
        f3 = np.where(x < mod // 2, q // 4, (q - q // 4) % q).astype(np.int64)
        out = self._bootstrap_func(cttmp, f3, q)
        out = out.replace(b=mo.sub_mod(out.b, jnp.uint32(q >> 2),
                                       jnp.uint32(q)))
        return out.replace(pt_modulus=2)

    def EvalDecomp(self, ct) -> list:
        """Decompose a large-precision ciphertext into digits mod q
        (binfhe-base-scheme.cpp EvalDecomp :452)."""
        beta = self.beta
        q = self.q
        mod = ct.modulus
        cttmp = ct
        out = []
        while mod > q:
            out.append(cttmp.replace(a=cttmp.a % q, b=cttmp.b % q,
                                     modulus=q))
            cttmp = self.EvalFloor(cttmp)
            mod = (mod * 2 * beta) // q
            cttmp = lwe.mod_switch(mod, cttmp)
        out.append(cttmp)
        return out
