"""CryptoContext: the user-facing FHE API.

Reference analog: /root/reference src/pke/include/cryptocontext.h:84
(CryptoContextImpl, 4042 LoC god-object) + gen-cryptocontext.h:88-92
(GenCryptoContext dispatch) + cryptocontextfactory.h (context dedup cache).

TPU-first architecture: the context is a *host* object holding frozen
parameter pytrees (bases, conversion tables) and key stores; every Eval* op
is a thin orchestration over pure jittable kernels. Method names mirror the
reference (KeyGen/Encrypt/EvalMult/...) so user code ports directly.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from openfhe_tpu.lattice import rns_tools as rt
from openfhe_tpu.lattice.automorph import (coeff_indices, conjugation_index,
                                           eval_indices,
                                           rotation_automorphism_index)
from openfhe_tpu.lattice.basis import Basis, make_basis
from openfhe_tpu.math import crt
from openfhe_tpu.math import modops as mo
from openfhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from openfhe_tpu.pke import parameters as prm
from openfhe_tpu.pke.ciphertext import Ciphertext, Plaintext
from openfhe_tpu.pke.constants import (EncryptionTechnique,
                                       KeySwitchTechnique, PKESchemeFeature,
                                       ScalingTechnique, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.encoding import ckks_packed
from openfhe_tpu.pke.keys import EvalKey, KeyPair, PrivateKey, PublicKey
from openfhe_tpu.pke.keyswitch import hybrid
from openfhe_tpu.pke.schemes import rns_pke

EVAL = 1
COEFF = 0


# ---------------------------------------------------------------------------
# Jitted kernels behind the eager per-op API. The reference's per-op
# CryptoContext surface IS its production path (cryptocontext.h:1871); on
# the axon dispatch path every eager XLA op costs ~0.5-0.9 ms, so each
# public op must issue its device compute as ONE jitted call. jax.jit's
# internal cache buckets traces by tower count/shape (one kernel serves
# every level); keys and tables are threaded as ARGUMENTS, not closure
# constants, so compiled programs stay small (JitPipeline's docstring
# explains why constant-embedding is fatal at production sizes).
# ---------------------------------------------------------------------------


@jax.jit
def _k_add(ea, eb, q):
    na, nb = len(ea), len(eb)
    return tuple(
        mo.add_mod(ea[i], eb[i], q) if (i < na and i < nb)
        else (ea[i] if i < na else eb[i])
        for i in range(max(na, nb)))


@jax.jit
def _k_sub(ea, eb, q):
    na, nb = len(ea), len(eb)
    out = []
    for i in range(max(na, nb)):
        if i < na and i < nb:
            out.append(mo.sub_mod(ea[i], eb[i], q))
        elif i < na:
            out.append(ea[i])
        else:
            out.append(mo.neg_mod(eb[i], q))
    return tuple(out)


@jax.jit
def _k_mult_plain(elems, pt_poly, basis):
    mm = lambda x: mo.mul_mod(x, pt_poly, basis.q, basis.r32,
                              basis.r32_sh, basis.m32)
    return tuple(mm(c) for c in elems)


@jax.jit
def _k_mult_relin_hybrid(a0, a1, b0, b1, ek, tabs):
    """Tensor product + relinearization as one program (the north-star
    op); engages the fused Pallas chain when the tables carry it."""
    basis = tabs.basis_ql
    if tabs.fused is not None and ek.bv_sh is not None:
        from openfhe_tpu.pke.keyswitch import ks_fused
        return ks_fused.mult_relin_fused(a0, a1, b0, b1, ek.bv, ek.av,
                                         ek.bv_sh, ek.av_sh, tabs.fused)
    mm = lambda x, y: mo.mul_mod(x, y, basis.q, basis.r32, basis.r32_sh,
                                 basis.m32)
    c0 = mm(a0, b0)
    c2 = mm(a1, b1)
    cross = mm(mo.add_mod(a0, a1, basis.q), mo.add_mod(b0, b1, basis.q))
    c1 = mo.sub_mod(mo.sub_mod(cross, c0, basis.q), c2, basis.q)
    d0, d1 = hybrid.keyswitch_core(c2, ek, tabs)
    return mo.add_mod(c0, d0, basis.q), mo.add_mod(c1, d1, basis.q)


@jax.jit
def _k_relin_hybrid(e0, e1, e2, ek, tabs):
    basis = tabs.basis_ql
    d0, d1 = hybrid.keyswitch_core(e2, ek, tabs)
    return mo.add_mod(e0, d0, basis.q), mo.add_mod(e1, d1, basis.q)


@jax.jit
def _k_automorph_hybrid(elems, idx, ek, tabs):
    basis = tabs.basis_ql
    rot = [jnp.take(c, idx, axis=-1) for c in elems]
    d0, d1 = hybrid.keyswitch_core(rot[1], ek, tabs)
    return mo.add_mod(rot[0], d0, basis.q), d1


@functools.partial(jax.jit, static_argnames=("dist", "ns"))
def _k_encrypt_pk(rng, pk, basis, pt_poly, dist, ns):
    c0, c1 = rns_pke.encrypt_zero_pk(rng, pk, basis, dist, ns_int=ns)
    return mo.add_mod(c0, pt_poly, basis.q), c1


@functools.partial(jax.jit, static_argnames=("ns",))
def _k_encrypt_sk(rng, sk, basis, pt_poly, ns):
    c0, c1 = rns_pke.encrypt_zero_sk(rng, sk, basis, ns_int=ns)
    return mo.add_mod(c0, pt_poly, basis.q), c1


_k_decrypt = jax.jit(lambda elems, sk, basis: rns_pke.decrypt_core(
    elems, sk, basis))


@jax.jit
def _k_rescale(elems, steps):
    """CKKS DropLastElementAndScale chain; `steps` is a tuple of
    (basis, DropScaleTables) from the widest tower count down."""
    from openfhe_tpu.lattice.dcrt import Poly
    for basis, tab in steps:
        elems = tuple(rt.drop_last_and_scale(Poly(c, EVAL), basis, tab).data
                      for c in elems)
    return elems


class CryptoContext:
    """One instantiated scheme (parameters frozen, tables precomputed)."""

    def __init__(self, params: prm.CCParams, seed: int = 0):
        params.validate()
        self.params = params
        self.scheme = params.scheme
        self._features = PKESchemeFeature(0)
        self._rng = jax.random.PRNGKey(seed)
        self._key_counter = 0

        if self.scheme == Scheme.CKKSRNS_SCHEME:
            self._init_ckks()
        elif self.scheme == Scheme.BGVRNS_SCHEME:
            self._init_bgv()
        elif self.scheme == Scheme.BFVRNS_SCHEME:
            self._init_bfv()

        # shared precompute caches (lazy, keyed by sizeQl)
        self._hybrid_cache: dict = {}
        self._rescale_cache: dict = {}
        # eval key stores (reference: static maps keyed by keyTag,
        # cryptocontext.h:243-245)
        self.eval_mult_keys: dict = {}
        self.eval_automorphism_keys: dict = {}
        self.eval_sum_keys: dict = {}

    # ------------------------------------------------------------------
    # parameter generation
    # ------------------------------------------------------------------

    def _init_common(self, moduli_q, extra_log_q: float = 0.0):
        p = self.params
        n = p.ring_dim
        self.moduli_q = list(moduli_q)
        if p.ks_technique == KeySwitchTechnique.HYBRID:
            self.moduli_p = prm.select_aux_moduli(
                n, self.moduli_q, p.num_large_digits, p.aux_mod_size)
        else:
            self.moduli_p = []
        log_q = sum(math.log2(q) for q in self.moduli_q)
        log_p = sum(math.log2(q) for q in self.moduli_p)
        prm.validate_security(p, n, log_q + log_p + extra_log_q)
        self.basis_q = make_basis(self.moduli_q, n)
        if self.moduli_p:
            self.basis_p = make_basis(self.moduli_p, n)
            self.basis_qp = self.basis_q.concat(self.basis_p)
            big_p = 1
            for q in self.moduli_p:
                big_p *= q
            self.big_p = big_p
            pm = [big_p % q for q in self.moduli_q] + [0] * len(self.moduli_p)
            mods = self.moduli_q + self.moduli_p
            self.p_modq, self.p_modq_sh = rt._shoup_pair(pm, mods)
        else:
            self.basis_p = None
            self.basis_qp = self.basis_q
            self.big_p = 1
            self.p_modq = self.p_modq_sh = None

    def _init_ckks(self):
        p = self.params
        if p.ring_dim == 0:
            est_log = (p.first_mod_size + p.mult_depth * p.scaling_mod_size)
            est_log += est_log / max(1, p.num_large_digits)  # + logP estimate
            p.ring_dim = prm.derive_ring_dim(p, est_log)
        self.ring_dim = p.ring_dim
        self.L = p.mult_depth
        self.comp_deg = (p.composite_degree
                         if self._composite() else 1)
        if self.comp_deg > 1:
            moduli = prm.select_ckks_moduli_composite(
                p.ring_dim, p.mult_depth, p.scaling_mod_size,
                p.first_mod_size, self.comp_deg)
        else:
            moduli = prm.select_ckks_moduli(
                p.ring_dim, p.mult_depth, p.scaling_mod_size,
                p.first_mod_size, flexible=self._flexible(),
                ext_mod_size=(prm.DEFAULT_EXTRA_MOD_SIZE
                              if self._flexible_ext() else 0))
        self._init_common(moduli)
        self.delta = float(2 ** p.scaling_mod_size)
        self.slots = p.batch_size or p.ring_dim // 2
        # Canonical per-level scaling factors (reference FLEXIBLEAUTO /
        # COMPOSITESCALING, ckksrns-cryptoparameters.cpp
        # m_scalingFactorsReal): level 0 anchors on the group of moduli
        # dropped first, then scf[l+1] = scf[l]^2 / drop_factor(l). Exact
        # per-level scales matter far more at 28-bit moduli than at the
        # reference's 59-bit ones.
        k = len(self.moduli_q)
        d = self.comp_deg
        n_levels = (k - d) // d + 1 if d > 1 else k
        if self._flexible() or self._composite():
            if self._flexible_ext():
                # FLEXIBLEAUTOEXT: the ext modulus q_ext tops the chain.
                # Fresh ciphertexts live at level 0 with noise degree 2 and
                # the big scale q_ext * q_top (reference
                # GetScalingFactorRealBig); defining
                # scf[0] = sqrt(q_ext * q_top) keeps every canonical-scale
                # recurrence scf[l+1] = scf[l]^2 / drop(l) intact with no
                # special cases downstream.
                scf = [math.sqrt(float(self.moduli_q[-1])
                                 * float(self.moduli_q[-2]))]
            else:
                scf = [float(self.drop_factor(0))]
            for lvl in range(1, n_levels):
                scf.append(scf[-1] * scf[-1] / float(
                    self.drop_factor(lvl - 1)))
        else:
            scf = [self.delta] * n_levels
        self.scf_real = scf

    def _composite(self) -> bool:
        return self.params.scaling_technique in (
            ScalingTechnique.COMPOSITESCALINGAUTO,
            ScalingTechnique.COMPOSITESCALINGMANUAL)

    def drop_factor(self, level: int) -> int:
        """Product of the moduli dropped when rescaling from `level`."""
        d = getattr(self, "comp_deg", 1)
        k = len(self.moduli_q)
        hi = k - d * level
        out = 1
        for q in self.moduli_q[hi - d:hi]:
            out *= q
        return out

    def _init_bgv(self):
        from openfhe_tpu.pke.schemes import bgv
        bgv.init_context(self)

    def _init_bfv(self):
        from openfhe_tpu.pke.schemes import bfv
        bfv.init_context(self)

    # ------------------------------------------------------------------
    # infrastructure
    # ------------------------------------------------------------------

    def Enable(self, feature: PKESchemeFeature) -> None:
        self._features |= feature

    def is_enabled(self, feature: PKESchemeFeature) -> bool:
        return bool(self._features & feature)

    def next_rng(self):
        self._rng, out = jax.random.split(self._rng)
        return out

    def GetRingDimension(self) -> int:
        return self.ring_dim

    def GetCyclotomicOrder(self) -> int:
        return 2 * self.ring_dim

    # -- API-parity getters (reference cryptocontext.h accessor surface;
    # our parameters/tables are plain attributes, these re-export them
    # under the reference names) ----------------------------------------
    def GetCryptoParameters(self):
        return self.params

    def GetEncodingParams(self):
        return self.params

    def GetElementParams(self):
        return self.basis_q

    def GetModulus(self) -> int:
        q = 1
        for m in self.moduli_q:
            q *= int(m)
        return q

    def GetRootOfUnity(self) -> int:
        """2N-th root of the first tower (reference GetRootOfUnity).
        psi_br[t, j] holds psi^brv(j), so index brv^-1(1) recovers psi."""
        from openfhe_tpu.lattice.basis import _bitrev_indices
        # index on device, fetch one scalar (not the whole [k, N] table)
        return int(self.basis_q.psi_br[
            0, int(_bitrev_indices(self.ring_dim)[1])])

    def GetScheme(self):
        return self.scheme

    def GetKeyGenLevel(self) -> int:
        return getattr(self, "_keygen_level", 0)

    def GetCKKSDataType(self):
        """(reference gen-cryptocontext-params.h:362)"""
        return self.params.ckks_data_type

    def SetKeyGenLevel(self, level: int) -> None:
        self._keygen_level = level

    def SetCKKSBootCorrectionFactor(self, factor: int) -> None:
        """Adjust the bootstrap correction factor before Setup
        (reference SetCKKSBootCorrectionFactor)."""
        self._boot_correction_override = int(factor)

    # eval-key map (de)serialization under the reference's method names
    def SerializeEvalMultKey(self, sertype=None):
        from openfhe_tpu.utils import serialization as ser
        return ser.serialize_eval_mult_keys(self)

    def DeserializeEvalMultKey(self, data) -> None:
        from openfhe_tpu.utils import serialization as ser
        ser.deserialize_eval_mult_keys(self, data)

    def SerializeEvalAutomorphismKey(self, sertype=None):
        from openfhe_tpu.utils import serialization as ser
        return ser.serialize_eval_automorphism_keys(self)

    def DeserializeEvalAutomorphismKey(self, data) -> None:
        from openfhe_tpu.utils import serialization as ser
        ser.deserialize_eval_automorphism_keys(self, data)

    SerializeEvalSumKey = SerializeEvalAutomorphismKey
    DeserializeEvalSumKey = DeserializeEvalAutomorphismKey

    def GetAllEvalMultKeys(self):
        return self.eval_mult_keys

    def GetEvalMultKeyVector(self, key_tag: str):
        return [self.eval_mult_keys[key_tag]]

    def size_ql(self, level: int) -> int:
        return len(self.moduli_q) - getattr(self, "comp_deg", 1) * level

    def basis_at(self, level: int) -> Basis:
        return self.basis_q.slice(0, self.size_ql(level))

    def basis_at_size(self, size_ql: int) -> Basis:
        return self.basis_q.slice(0, size_ql)

    def hybrid_tables(self, size_ql: int) -> hybrid.HybridTables:
        if size_ql not in self._hybrid_cache:
            self._hybrid_cache[size_ql] = hybrid.make_hybrid_tables(
                self.basis_q, self.basis_p, size_ql,
                self.params.num_large_digits,
                ns_int=getattr(self, "noise_scale_int", 1))
        return self._hybrid_cache[size_ql]

    def bv_tables(self, size_ql: int):
        from openfhe_tpu.pke.keyswitch import bv
        cache = self._hybrid_cache.setdefault("bv", {})
        if size_ql not in cache:
            cache[size_ql] = bv.make_bv_tables(self.basis_q, size_ql)
        return cache[size_ql]

    def _keyswitch_core(self, c, ek, size_ql: int):
        """Dispatch on the configured key-switch technique (reference:
        KeySwitchBV vs KeySwitchHYBRID capability objects)."""
        if self.params.ks_technique == KeySwitchTechnique.BV:
            from openfhe_tpu.pke.keyswitch import bv
            if self.params.digit_size:
                d_cnt = bv._digit_count(self.basis_q, len(self.moduli_q),
                                        self.params.digit_size)
                return bv.keyswitch_core_digits(
                    c, ek, self.basis_at_size(size_ql),
                    self.params.digit_size, d_cnt, len(self.moduli_q))
            return bv.keyswitch_core(c, ek, self.bv_tables(size_ql))
        return hybrid.keyswitch_core(c, ek, self.hybrid_tables(size_ql))

    def rescale_tables(self, size_ql: int) -> rt.DropScaleTables:
        if size_ql not in self._rescale_cache:
            self._rescale_cache[size_ql] = rt.make_drop_scale_tables(
                tuple(self.moduli_q[:size_ql]))
        return self._rescale_cache[size_ql]

    # ------------------------------------------------------------------
    # key generation
    # ------------------------------------------------------------------

    def KeyGen(self) -> KeyPair:
        self._key_counter += 1
        tag = f"key-{self._key_counter}"
        ns = getattr(self, "noise_scale_int", 1)
        return rns_pke.keygen(self.next_rng(), self.basis_qp,
                              len(self.moduli_q), tag,
                              self.params.secret_key_dist,
                              self.params.standard_deviation, ns_int=ns)

    def SparseKeyGen(self) -> KeyPair:
        """Key pair with a sparse-ternary secret (reference SparseKeyGen,
        cryptocontext.h:1238; hamming weight 192)."""
        from openfhe_tpu.pke.constants import SecretKeyDist
        self._key_counter += 1
        tag = f"key-{self._key_counter}"
        ns = getattr(self, "noise_scale_int", 1)
        return rns_pke.keygen(self.next_rng(), self.basis_qp,
                              len(self.moduli_q), tag,
                              SecretKeyDist.SPARSE_TERNARY,
                              self.params.standard_deviation, ns_int=ns)

    def KeySwitchGen(self, old_key: PrivateKey,
                     new_key: PrivateKey) -> EvalKey:
        ns = getattr(self, "noise_scale_int", 1)
        if self.params.ks_technique == KeySwitchTechnique.BV:
            from openfhe_tpu.pke.keyswitch import bv
            return bv.keyswitch_gen(self.next_rng(), old_key, new_key,
                                    self.basis_q, len(self.moduli_q),
                                    ns_int=ns,
                                    digit_size=self.params.digit_size)
        return hybrid.keyswitch_gen(
            self.next_rng(), old_key, new_key, self.basis_qp,
            len(self.moduli_q), self.params.num_large_digits,
            self.p_modq, self.p_modq_sh, ns_int=ns)

    def EvalMultKeyGen(self, sk: PrivateKey) -> None:
        """Relinearization key: s^2 -> s (reference cryptocontext.h:1764)."""
        b = self.basis_qp
        s_sq = mo.mul_mod(sk.s_qp, sk.s_qp, b.q, b.r32, b.r32_sh, b.m32)
        sk2 = PrivateKey(s_qp=s_sq, key_tag=sk.key_tag)
        self.eval_mult_keys[sk.key_tag] = self.KeySwitchGen(sk2, sk)

    def EvalMultKeysGen(self, sk: PrivateKey) -> None:
        self.EvalMultKeyGen(sk)

    def _automorphism_keygen(self, sk: PrivateKey, g: int) -> EvalKey:
        idx = jnp.asarray(eval_indices(self.ring_dim, g))
        s_g = jnp.take(sk.s_qp, idx, axis=-1)
        sk_g = PrivateKey(s_qp=s_g, key_tag=sk.key_tag)
        return self.KeySwitchGen(sk_g, sk)

    def EvalAutomorphismKeyGen(self, sk: PrivateKey, g_list) -> None:
        store = self.eval_automorphism_keys.setdefault(sk.key_tag, {})
        for g in g_list:
            if g not in store:
                store[g] = self._automorphism_keygen(sk, g)

    def EvalRotateKeyGen(self, sk: PrivateKey, index_list) -> None:
        """(reference: EvalAtIndexKeyGen / EvalRotateKeyGen)"""
        gs = [rotation_automorphism_index(r, self.ring_dim)
              for r in index_list]
        self.EvalAutomorphismKeyGen(sk, gs)

    EvalAtIndexKeyGen = EvalRotateKeyGen

    def EvalConjugateKeyGen(self, sk: PrivateKey) -> None:
        self.EvalAutomorphismKeyGen(sk, [conjugation_index(self.ring_dim)])

    # ------------------------------------------------------------------
    # encoding (CKKS)
    # ------------------------------------------------------------------

    def MakeCKKSPackedPlaintext(self, values, scale_deg: int = 1,
                                level: int = 0, slots: int | None = None,
                                scale: float | None = None) -> Plaintext:
        slots = slots or min(self.slots, self.ring_dim // 2)
        if (scale is None and level == 0 and scale_deg == 1
                and self.scheme == Scheme.CKKSRNS_SCHEME
                and self._flexible_ext()):
            # FLEXIBLEAUTOEXT fresh encodings use the big degree-2 scale
            # q_ext * q_top at level 0 (reference MakePlaintext /
            # GetScalingFactorRealBig); the first rescale drops q_ext.
            scale_deg = 2
        if scale is None:
            scale = self.scale_at(level) ** scale_deg
        size = self.size_ql(level)
        coeffs = ckks_packed.encode_to_coeffs(values, self.ring_dim, slots,
                                              scale)
        res = crt.to_residues_host(coeffs, tuple(self.moduli_q[:size]))
        poly = ntt_fwd(jnp.asarray(res), self.basis_at(level))
        return Plaintext(poly=poly, fmt=EVAL, level=level,
                         noise_deg=scale_deg, scale=scale, slots=slots,
                         values=np.asarray(values))

    def _cached_plaintext(self, values, level: int, slots: int,
                          scale_deg: int = 1) -> Plaintext:
        """Memoized CKKS encoding for long-lived coefficient arrays (the
        bootstrap / scheme-switch diagonal tables): the reference encodes
        these ONCE at setup (EvalCoeffsToSlotsPrecompute); re-encoding per
        call costs a host NTT per diagonal per invocation. Keyed by array
        identity — callers must pass arrays owned by a context-lifetime
        precompute object."""
        cache = getattr(self, "_pt_cache", None)
        if cache is None:
            cache = self._pt_cache = {}
        key = (id(values), level, slots, scale_deg)
        if key not in cache:
            cache[key] = self.MakeCKKSPackedPlaintext(
                values, scale_deg=scale_deg, level=level, slots=slots)
        return cache[key]

    def MakePackedPlaintext(self, values, noise_deg: int = 1,
                            level: int = 0) -> Plaintext:
        """Integer SIMD packing (reference: MakePackedPlaintext)."""
        if self.scheme == Scheme.BGVRNS_SCHEME:
            from openfhe_tpu.pke.schemes import bgv
            return bgv.make_packed_plaintext(self, values, level=level,
                                             noise_deg=noise_deg)
        if self.scheme == Scheme.BFVRNS_SCHEME:
            from openfhe_tpu.pke.schemes import bfv
            return bfv.make_packed_plaintext(self, values)
        raise ValueError("PackedPlaintext requires BGV/BFV")

    def MakePlaintext(self, encoding, values) -> Plaintext:
        """Generic factory dispatching on PlaintextEncodings (reference
        MakePlaintext, plaintextfactory.h:136)."""
        from openfhe_tpu.pke.constants import PlaintextEncodings as PE
        if encoding == PE.PACKED_ENCODING:
            return self.MakePackedPlaintext(values)
        if encoding == PE.CKKS_PACKED_ENCODING:
            return self.MakeCKKSPackedPlaintext(values)
        if encoding == PE.COEF_PACKED_ENCODING:
            return self.MakeCoefPackedPlaintext(values)
        if encoding == PE.STRING_ENCODING:
            return self.MakeStringPlaintext(values)
        raise ValueError(f"unknown plaintext encoding {encoding}")

    def MakeCoefPackedPlaintext(self, values) -> Plaintext:
        """Coefficient packing (reference: MakeCoefPackedPlaintext)."""
        from openfhe_tpu.pke.encoding.packed import coef_encode
        t = self.plaintext_modulus
        coeffs = coef_encode(values, t, self.ring_dim)
        centered = np.where(coeffs > t // 2, coeffs - t, coeffs)
        res = crt.to_residues_host(centered, tuple(self.moduli_q))
        poly = ntt_fwd(jnp.asarray(res), self.basis_q)
        return Plaintext(poly=poly, fmt=EVAL, level=0, slots=self.ring_dim,
                         encoding="COEF_PACKED", values=np.asarray(values))

    def MakeStringPlaintext(self, s: str) -> Plaintext:
        from openfhe_tpu.pke.encoding.packed import string_encode
        t = self.plaintext_modulus
        coeffs = string_encode(s, t, self.ring_dim)
        res = crt.to_residues_host(coeffs, tuple(self.moduli_q))
        poly = ntt_fwd(jnp.asarray(res), self.basis_q)
        return Plaintext(poly=poly, fmt=EVAL, level=0, slots=self.ring_dim,
                         encoding="STRING", values=s)

    def decode_ckks(self, coeff_residues: np.ndarray, level: int,
                    scale: float, slots: int) -> np.ndarray:
        size = coeff_residues.shape[-2]
        vals = crt.interpolate_centered_float(coeff_residues,
                                              tuple(self.moduli_q[:size]))
        return ckks_packed.decode_from_coeffs(vals, self.ring_dim, slots,
                                              scale)

    # ------------------------------------------------------------------
    # encrypt / decrypt
    # ------------------------------------------------------------------

    def Encrypt(self, key, plaintext: Plaintext) -> Ciphertext:
        if (self.scheme == Scheme.BFVRNS_SCHEME
                and self.params.encryption_technique
                == EncryptionTechnique.EXTENDED):
            from openfhe_tpu.pke.schemes import bfv
            return bfv.encrypt_extended(self, key, plaintext)
        basis = self.basis_at(plaintext.level)
        ns = getattr(self, "noise_scale_int", 1)
        if isinstance(key, KeyPair):
            key = key.public_key
        pt_poly = plaintext.poly
        if self.scheme == Scheme.BFVRNS_SCHEME:
            from openfhe_tpu.pke.schemes import bfv
            pt_poly = bfv.scale_plaintext_for_add(self, pt_poly)
        if isinstance(key, PublicKey):
            c0, c1 = _k_encrypt_pk(self.next_rng(), key, basis, pt_poly,
                                   dist=self.params.secret_key_dist, ns=ns)
            tag = key.key_tag
        else:
            c0, c1 = _k_encrypt_sk(self.next_rng(), key, basis, pt_poly,
                                   ns=ns)
            tag = key.key_tag
        return Ciphertext(elements=(c0, c1), level=plaintext.level,
                          noise_deg=plaintext.noise_deg,
                          scale=plaintext.scale, slots=plaintext.slots,
                          key_tag=tag, encoding=plaintext.encoding,
                          scale_int=plaintext.scale_int)

    def Decrypt(self, sk: PrivateKey, ct: Ciphertext) -> Plaintext:
        from openfhe_tpu.pke.constants import (DecryptionNoiseMode,
                                               ExecutionMode)
        basis = self.basis_at(ct.level)
        b = _k_decrypt(tuple(ct.elements), sk, basis)
        if self.scheme == Scheme.CKKSRNS_SCHEME:
            # CKKS noise-flooding decryption (reference NoiseFlooding:
            # constants-defs.h:131, ckks-noise-flooding.cpp): in evaluation
            # mode with flooding enabled, add ~2^noise_estimate Gaussian
            # noise so the decryption output leaks nothing beyond the result
            if (self.params.decryption_noise_mode ==
                    DecryptionNoiseMode.NOISE_FLOODING_DECRYPT
                    and self.params.execution_mode ==
                    ExecutionMode.EXEC_EVALUATION
                    and self.params.noise_estimate > 0):
                from openfhe_tpu.math import sampling
                sigma = 2.0 ** self.params.noise_estimate
                flood = sampling.discrete_gaussian(
                    self.next_rng(), (self.ring_dim,), sigma=min(
                        sigma, 2.0 ** 30))
                b = mo.add_mod(b, sampling.to_residues(flood, basis),
                               basis.q)
            vals = self.decode_ckks(np.asarray(b), ct.level, ct.scale,
                                    ct.slots)
            log_err = 0.0
            if (self.params.execution_mode ==
                    ExecutionMode.EXEC_NOISE_ESTIMATION):
                # imaginary residue of a real computation estimates the
                # accumulated noise (reference GetLogError convention)
                imag = np.abs(np.imag(vals))
                log_err = float(np.log2(max(imag.max() * ct.scale, 1.0)))
            return Plaintext(poly=b, fmt=COEFF, level=ct.level,
                             scale=ct.scale, slots=ct.slots, values=vals,
                             log_error=log_err)
        from openfhe_tpu.pke.schemes import bfv, bgv
        if self.scheme == Scheme.BGVRNS_SCHEME:
            return bgv.decrypt_tail(self, b, ct)
        return bfv.decrypt_tail(self, b, ct)

    # ------------------------------------------------------------------
    # leveled ops (reference: base/rns-leveledshe)
    # ------------------------------------------------------------------

    def _auto(self) -> bool:
        return self.params.scaling_technique in (
            ScalingTechnique.FIXEDAUTO, ScalingTechnique.FLEXIBLEAUTO,
            ScalingTechnique.FLEXIBLEAUTOEXT,
            ScalingTechnique.COMPOSITESCALINGAUTO)

    def _flexible(self) -> bool:
        return self.params.scaling_technique in (
            ScalingTechnique.FLEXIBLEAUTO, ScalingTechnique.FLEXIBLEAUTOEXT,
            ScalingTechnique.COMPOSITESCALINGAUTO,
            ScalingTechnique.COMPOSITESCALINGMANUAL)

    def _flexible_ext(self) -> bool:
        return (self.params.scaling_technique
                == ScalingTechnique.FLEXIBLEAUTOEXT)

    def scale_at(self, level: int) -> float:
        """Canonical scaling factor for a depth-1 ciphertext at `level`."""
        if self.scheme == Scheme.CKKSRNS_SCHEME:
            return self.scf_real[level]
        return self.delta

    def _scalar_mult_raw(self, ct: Ciphertext, value: float,
                         pt_scale: float) -> Ciphertext:
        """Multiply by a scalar encoded at an explicit plaintext scale.

        The workhorse of FLEXIBLE scale canonicalization (reference
        EvalMultCoreInPlace(ct, double) in ckksrns-leveledshe.cpp): value
        semantics value *= `value`, tracked scale *= `pt_scale`."""
        pt = self.MakeCKKSPackedPlaintext(
            np.full(ct.slots, value, np.complex128), level=ct.level,
            slots=ct.slots, scale=pt_scale)
        basis = self.basis_at(ct.level)
        mm = lambda x: mo.mul_mod(x, pt.poly, basis.q, basis.r32,
                                  basis.r32_sh, basis.m32)
        return ct.replace(elements=tuple(mm(c) for c in ct.elements),
                          noise_deg=ct.noise_deg + 1,
                          scale=ct.scale * pt_scale)

    def _adjust_flexible(self, a: Ciphertext, b: Ciphertext,
                         for_mult: bool = False):
        """FLEXIBLE-mode level/depth alignment with exact scale matching
        (reference AdjustLevelsAndDepthInPlace, ckksrns-leveledshe.cpp:603).

        Brings the shallower-level operand to the other's (level, deg) via
        one scalar multiplication whose encoding scale is chosen so the
        result lands exactly on the target's scale. Uses the operand's
        actual scale, so mildly non-canonical inputs are corrected too.
        """
        def bring(x, l2, d2, target_scale):
            if x.noise_deg == 2 and x.level < l2:
                x = self.ModReduce(x)
            if x.level == l2 and x.noise_deg == d2:
                return x
            if d2 == 2:
                x = self._scalar_mult_raw(x, 1.0, target_scale / x.scale)
                if x.level < l2:
                    x = self.LevelReduce(x, l2 - x.level)
                return x
            # d2 == 1, x.level < l2 (deg already 1 here)
            if x.level == l2:
                return x
            ql = self.drop_factor(l2 - 1)
            x = self._scalar_mult_raw(
                x, 1.0, target_scale * float(ql) / x.scale)
            if x.level < l2 - 1:
                x = self.LevelReduce(x, l2 - 1 - x.level)
            return self.ModReduce(x)

        if a.level == b.level and a.noise_deg == b.noise_deg:
            if (not for_mult and a.noise_deg == 1
                    and abs(a.scale / b.scale - 1.0) > 1e-10):
                # residual drift (non-canonical inputs, e.g. a LevelReduce
                # across composite groups): raise both to a common deg-2
                # scale with x1 multiplications. On the MULT path this is
                # never needed (scales multiply exactly) and would blow
                # the product to deg 4. Only possible while deg-2 still
                # fits under the remaining modulus — otherwise add as-is,
                # matching reference FIXEDMANUAL drift semantics
                # (ckksrns-leveledshe.cpp EvalAddCore).
                t = self.scale_at(a.level) ** 2
                logq_rem = sum(math.log2(float(q)) for q in
                               self.moduli_q[:self.size_ql(a.level)])
                if math.log2(t) + 12 < logq_rem:
                    a = self._scalar_mult_raw(a, 1.0, t / a.scale)
                    b = self._scalar_mult_raw(b, 1.0, t / b.scale)
            return a, b
        # order by (level, deg): bring the "behind" one forward
        if (a.level, a.noise_deg) < (b.level, b.noise_deg):
            a = bring(a, b.level, b.noise_deg, b.scale)
        else:
            b = bring(b, a.level, a.noise_deg, a.scale)
        return a, b

    def _eval_times_int(self, ct: Ciphertext, k: int) -> Ciphertext:
        """Multiply every element by the integer scalar k (mod each q_i);
        the BGV scale-factor correction multiply (reference
        EvalMultCoreInPlace(ciphertext, scalar), bgvrns-leveledshe.cpp).
        Uses the centered representative of k mod t to limit noise."""
        t = self.plaintext_modulus
        k = k % t
        kc = k - t if k > t // 2 else k       # centered, |kc| <= t/2
        basis = self.basis_at(ct.level)
        vals = [kc % q for q in basis.moduli]
        c, c_sh = rt._shoup_pair(vals, basis.moduli)
        elems = tuple(mo.mul_mod_shoup(e, c, c_sh, basis.q)
                      for e in ct.elements)
        return ct.replace(elements=elems,
                          scale_int=(ct.scale_int * k) % t)

    def _adjust_pair_bgv(self, a: Ciphertext, b: Ciphertext):
        """BGV AdjustLevelsAndDepth (bgvrns-leveledshe.cpp:84-225): align
        tower counts by plain LevelReduce (valid in BGV: the invariant
        value m + t*e is far below any Q_l), then equalize the integer
        scale factors with a correction multiply. noise_deg carries no
        scale meaning in BGV (unlike CKKS), only noise bookkeeping."""
        if a.level < b.level:
            a = self.LevelReduce(a, b.level - a.level)
        elif b.level < a.level:
            b = self.LevelReduce(b, a.level - b.level)
        t = self.plaintext_modulus
        if a.scale_int % t != b.scale_int % t:
            ratio = (b.scale_int * pow(a.scale_int % t, -1, t)) % t
            a = self._eval_times_int(a, ratio)
        deg = max(a.noise_deg, b.noise_deg)
        return a.replace(noise_deg=deg), b.replace(noise_deg=deg)

    def _adjust_pair(self, a: Ciphertext, b: Ciphertext,
                     for_mult: bool = False):
        """AdjustLevelsAndDepth (base-leveledshe.cpp): equalize level and
        noise degree of two ciphertexts before +/-.

        Mismatched noise degrees mean mismatched scales (delta vs delta^2);
        like the reference we either rescale the deg-2 operand (when it is
        at the shallower level) or raise the deg-1 operand by a x1
        plaintext multiplication."""
        if self.scheme == Scheme.CKKSRNS_SCHEME and self._flexible():
            return self._adjust_flexible(a, b, for_mult=for_mult)
        if self.scheme == Scheme.BGVRNS_SCHEME:
            return self._adjust_pair_bgv(a, b)
        if self.scheme == Scheme.BFVRNS_SCHEME:
            # BFV is scale-invariant: only tower counts need aligning
            while a.level < b.level:
                a = self.LevelReduce(a, b.level - a.level)
            while b.level < a.level:
                b = self.LevelReduce(b, a.level - b.level)
            deg = max(a.noise_deg, b.noise_deg)
            return a.replace(noise_deg=deg), b.replace(noise_deg=deg)
        if a.noise_deg != b.noise_deg:
            if self._auto():
                if a.noise_deg == 2 and a.level <= b.level:
                    a = self.ModReduce(a)
                elif b.noise_deg == 2 and b.level <= a.level:
                    b = self.ModReduce(b)
            if a.noise_deg < b.noise_deg:
                a = self._eval_mult_plain(a, self._encode_like_mult(a, 1.0))
            elif b.noise_deg < a.noise_deg:
                b = self._eval_mult_plain(b, self._encode_like_mult(b, 1.0))
        while a.level < b.level:
            a = self.LevelReduce(a, b.level - a.level)
        while b.level < a.level:
            b = self.LevelReduce(b, a.level - b.level)
        return a, b

    def EvalAdd(self, a, b) -> Ciphertext:
        if isinstance(b, (int, float, complex)) and not isinstance(b, bool):
            return self._eval_add_scalar(a, b)
        if isinstance(b, Plaintext):
            return self._eval_add_plain(a, b)
        a, b = self._adjust_pair(a, b)
        basis = self.basis_at(a.level)
        return a.replace(elements=_k_add(tuple(a.elements),
                                         tuple(b.elements), basis.q))

    def EvalSub(self, a, b) -> Ciphertext:
        if isinstance(b, (int, float, complex)) and not isinstance(b, bool):
            return self._eval_add_scalar(a, -b)
        if isinstance(b, Plaintext):
            return self._eval_add_plain(a, b, negate=True)
        a, b = self._adjust_pair(a, b)
        basis = self.basis_at(a.level)
        return a.replace(elements=_k_sub(tuple(a.elements),
                                         tuple(b.elements), basis.q))

    def EvalNegate(self, a: Ciphertext) -> Ciphertext:
        basis = self.basis_at(a.level)
        return a.replace(elements=tuple(mo.neg_mod(c, basis.q)
                                        for c in a.elements))

    # -- API-parity aliases (reference cryptocontext.h). Ciphertexts are
    # immutable pytrees here, so the InPlace/Mutable C++ variants are the
    # same functional op returning a new ciphertext. --------------------
    def EvalAddInPlace(self, a, b):
        return self.EvalAdd(a, b)

    EvalAddMutable = EvalAddInPlace
    EvalAddNoCheck = EvalAddInPlace

    def EvalSubInPlace(self, a, b):
        return self.EvalSub(a, b)

    EvalSubMutable = EvalSubInPlace

    def EvalMultInPlace(self, a, b):
        return self.EvalMult(a, b)

    EvalMultMutable = EvalMultInPlace

    def EvalMultAndRelinearize(self, a, b):
        """(reference EvalMultAndRelinearize) tensor + full relin."""
        return self.Relinearize(self.EvalMultNoRelin(a, b))

    def EvalNegateInPlace(self, a):
        return self.EvalNegate(a)

    def EvalSquareInPlace(self, a):
        return self.EvalSquare(a)

    EvalSquareMutable = EvalSquareInPlace

    def EvalAtIndex(self, ct, index: int):
        """(reference EvalAtIndex == EvalRotate)"""
        return self.EvalRotate(ct, index)

    def EvalAtIndexKeyGen(self, sk, index_list):
        return self.EvalRotateKeyGen(sk, index_list)

    EvalAddInPlaceNoCheck = EvalAddInPlace
    EvalAddMutableInPlace = EvalAddInPlace
    EvalSubMutableInPlace = EvalSubInPlace
    EvalMultMutableInPlace = EvalMultInPlace

    def EvalMultNoCheck(self, a, b):
        return self.EvalMult(a, b)

    def EvalAddManyInPlace(self, cts):
        return self.EvalAddMany(cts)

    def EvalMultNoRelinNoCheck(self, a, b):
        return self.EvalMultNoRelin(a, b)

    def EvalLinearWSumMutable(self, cts, weights):
        return self.EvalLinearWSum(cts, weights)

    def _encode_like(self, ct: Ciphertext, values) -> Plaintext:
        if self.scheme == Scheme.CKKSRNS_SCHEME:
            return self.MakeCKKSPackedPlaintext(
                np.broadcast_to(np.asarray(values, np.complex128),
                                (ct.slots,)),
                scale_deg=ct.noise_deg, level=ct.level, slots=ct.slots)
        return self.MakePackedPlaintext(
            np.broadcast_to(np.asarray(values, np.int64), (ct.slots,)),
            level=ct.level)

    def _eval_add_plain(self, ct: Ciphertext, pt: Plaintext,
                        negate: bool = False) -> Ciphertext:
        if pt.level != ct.level or (
                self.scheme == Scheme.CKKSRNS_SCHEME
                and pt.noise_deg != ct.noise_deg):
            if self.scheme == Scheme.CKKSRNS_SCHEME:
                pt = self.MakeCKKSPackedPlaintext(
                    pt.values, scale_deg=ct.noise_deg, level=ct.level,
                    slots=ct.slots)
            else:
                pt = self.MakePackedPlaintext(pt.values, level=ct.level)
        basis = self.basis_at(ct.level)
        pt_poly = pt.poly
        if self.scheme == Scheme.BFVRNS_SCHEME:
            from openfhe_tpu.pke.schemes import bfv
            pt_poly = bfv.scale_plaintext_for_add(self, pt_poly)
        op = mo.sub_mod if negate else mo.add_mod
        c0 = op(ct.elements[0], pt_poly, basis.q)
        return ct.replace(elements=(c0,) + ct.elements[1:])

    def _eval_add_scalar(self, ct: Ciphertext, s) -> Ciphertext:
        pt = self._encode_like(ct, s)
        return self._eval_add_plain(ct, pt)

    def EvalMultNoRelin(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """Tensor product (c0d0, c0d1+c1d0, c1d1)."""
        if self.scheme == Scheme.BFVRNS_SCHEME:
            from openfhe_tpu.pke.schemes import bfv
            return bfv.eval_mult_no_relin(self, a, b)
        if self._auto():
            if a.noise_deg == 2:
                a = self.ModReduce(a)
            if b.noise_deg == 2:
                b = self.ModReduce(b)
        a, b = self._adjust_pair(a, b, for_mult=True)
        basis = self.basis_at(a.level)
        mm = lambda x, y: mo.mul_mod(x, y, basis.q, basis.r32, basis.r32_sh,
                                     basis.m32)
        a0, a1 = a.elements[0], a.elements[1]
        b0, b1 = b.elements[0], b.elements[1]
        # Karatsuba: c1 = (a0+a1)(b0+b1) - c0 - c2 — 3 modmuls, not 4
        # (the elementwise var x var modmul is VPU-bound on TPU)
        c0 = mm(a0, b0)
        c2 = mm(a1, b1)
        cross = mm(mo.add_mod(a0, a1, basis.q), mo.add_mod(b0, b1, basis.q))
        c1 = mo.sub_mod(mo.sub_mod(cross, c0, basis.q), c2, basis.q)
        return a.replace(elements=(c0, c1, c2), noise_deg=a.noise_deg + b.noise_deg,
                         scale=a.scale * b.scale,
                         scale_int=a.scale_int * b.scale_int)

    def Relinearize(self, ct: Ciphertext) -> Ciphertext:
        if len(ct.elements) == 2:
            return ct
        assert len(ct.elements) == 3, "relin beyond degree 2 via chain"
        ek = self.eval_mult_keys[ct.key_tag]
        size = self.size_ql(ct.level)
        if self.params.ks_technique == KeySwitchTechnique.HYBRID:
            c0, c1 = _k_relin_hybrid(ct.elements[0], ct.elements[1],
                                     ct.elements[2], ek,
                                     self.hybrid_tables(size))
            return ct.replace(elements=(c0, c1))
        d0, d1 = self._keyswitch_core(ct.elements[2], ek, size)
        basis = self.basis_at(ct.level)
        c0 = mo.add_mod(ct.elements[0], d0, basis.q)
        c1 = mo.add_mod(ct.elements[1], d1, basis.q)
        return ct.replace(elements=(c0, c1))

    def EvalMult(self, a, b) -> Ciphertext:
        if isinstance(b, (int, float, complex)) and not isinstance(b, bool):
            return self._eval_mult_plain(a, self._encode_like_mult(a, b))
        if isinstance(b, Plaintext):
            return self._eval_mult_plain(a, b)
        if (self.params.ks_technique == KeySwitchTechnique.HYBRID
                and self.scheme != Scheme.BFVRNS_SCHEME
                and len(a.elements) == 2 and len(b.elements) == 2):
            # eager fast path: tensor + relin as ONE jitted dispatch
            if self._auto():
                if a.noise_deg == 2:
                    a = self.ModReduce(a)
                if b.noise_deg == 2:
                    b = self.ModReduce(b)
            a, b = self._adjust_pair(a, b, for_mult=True)
            ek = self.eval_mult_keys[a.key_tag]
            tabs = self.hybrid_tables(self.size_ql(a.level))
            c0, c1 = _k_mult_relin_hybrid(a.elements[0], a.elements[1],
                                          b.elements[0], b.elements[1],
                                          ek, tabs)
            return a.replace(elements=(c0, c1),
                             noise_deg=a.noise_deg + b.noise_deg,
                             scale=a.scale * b.scale,
                             scale_int=a.scale_int * b.scale_int)
        return self.Relinearize(self.EvalMultNoRelin(a, b))

    def EvalSquare(self, a: Ciphertext) -> Ciphertext:
        return self.EvalMult(a, a)

    def _encode_like_mult(self, ct: Ciphertext, values) -> Plaintext:
        if self.scheme == Scheme.CKKSRNS_SCHEME:
            return self.MakeCKKSPackedPlaintext(
                np.broadcast_to(np.asarray(values, np.complex128),
                                (ct.slots,)),
                scale_deg=1, level=ct.level, slots=ct.slots)
        if self.scheme == Scheme.BGVRNS_SCHEME:
            from openfhe_tpu.pke.schemes import bgv
            return bgv.make_packed_plaintext(
                self, np.broadcast_to(np.asarray(values, np.int64),
                                      (self.ring_dim,)),
                level=ct.level, apply_factor=False)
        return self.MakePackedPlaintext(
            np.broadcast_to(np.asarray(values, np.int64), (self.ring_dim,)))

    def JitPipeline(self, fn):
        """Compile a multi-op pipeline (e.g. a whole EvalBootstrap) into
        ONE XLA program.

        Plain `jax.jit(fn)` would embed every eval key and cached
        diagonal plaintext the pipeline touches as PROGRAM CONSTANTS
        (hundreds of MB at production sizes — rejected by remote-compile
        request limits and re-serialized per compile). This wrapper
        threads the context's key maps and plaintext cache through as
        jit ARGUMENTS instead, temporarily rebinding the context's
        attributes to the traced values during tracing.

        Usage: run `fn(ct)` once eagerly first (fills the plaintext
        cache so no host encoding happens mid-trace), then
        `jitted = cc.JitPipeline(fn); jitted(ct)`.
        """
        import functools

        @functools.partial(jax.jit)
        def inner(ct, state):
            saved = (self.eval_mult_keys, self.eval_automorphism_keys,
                     self.eval_sum_keys, getattr(self, "_pt_cache", {}))
            (self.eval_mult_keys, self.eval_automorphism_keys,
             self.eval_sum_keys, self._pt_cache) = state
            try:
                return fn(ct)
            finally:
                (self.eval_mult_keys, self.eval_automorphism_keys,
                 self.eval_sum_keys, self._pt_cache) = saved

        def run(ct):
            state = (self.eval_mult_keys, self.eval_automorphism_keys,
                     self.eval_sum_keys, getattr(self, "_pt_cache", {}))
            return inner(ct, state)

        return run

    def _eval_mult_plain(self, ct: Ciphertext, pt: Plaintext) -> Ciphertext:
        if self.scheme == Scheme.CKKSRNS_SCHEME and self._auto() \
                and ct.noise_deg == 2:
            ct = self.ModReduce(ct)
        if pt.level != ct.level and self.scheme != Scheme.BFVRNS_SCHEME:
            # keep the PLAINTEXT's slot count: linear-transform diagonals
            # are encoded wider than the ciphertext's logical slots
            pt = self._encode_like_mult(ct, pt.values) \
                if self.scheme == Scheme.BGVRNS_SCHEME else \
                self.MakeCKKSPackedPlaintext(pt.values, scale_deg=1,
                                             level=ct.level,
                                             slots=pt.slots or ct.slots)
        basis = self.basis_at(ct.level)
        elems = _k_mult_plain(tuple(ct.elements), pt.poly, basis)
        return ct.replace(elements=elems,
                          noise_deg=ct.noise_deg + pt.noise_deg,
                          scale=ct.scale * pt.scale,
                          scale_int=ct.scale_int * pt.scale_int)

    # ------------------------------------------------------------------
    # rescaling / level management (reference: rns-leveledshe.cpp:186-390)
    # ------------------------------------------------------------------

    def ModReduce(self, ct: Ciphertext, levels: int | None = None
                  ) -> Ciphertext:
        """CKKS rescale / BGV modulus reduction."""
        if self.scheme == Scheme.BGVRNS_SCHEME:
            from openfhe_tpu.pke.schemes import bgv
            return bgv.mod_reduce(self, ct, levels)
        if self.scheme == Scheme.BFVRNS_SCHEME:
            raise ValueError("ModReduce is not applicable to BFV")
        levels = 1 if levels is None else levels
        d = getattr(self, "comp_deg", 1)
        # one logical level = comp_deg tower drops (reference
        # COMPOSITESCALING ModReduceInternalInPlace(compositeDegree));
        # the whole drop chain runs as ONE jitted dispatch
        size = self.size_ql(ct.level)
        steps = []
        scale = ct.scale
        for i in range(levels * d):
            steps.append((self.basis_q.slice(0, size - i),
                          self.rescale_tables(size - i)))
            scale /= self.moduli_q[size - i - 1]
        elems = _k_rescale(tuple(ct.elements), tuple(steps))
        return ct.replace(elements=elems, level=ct.level + levels,
                          noise_deg=max(1, ct.noise_deg - levels),
                          scale=scale)

    Rescale = ModReduce
    RescaleInPlace = ModReduce
    ModReduceInPlace = ModReduce

    def LevelReduce(self, ct: Ciphertext, levels: int = 1) -> Ciphertext:
        """Drop towers without scaling (reference LevelReduce)."""
        size = self.size_ql(ct.level + levels)
        return ct.replace(
            elements=tuple(c[..., :size, :] for c in ct.elements),
            level=ct.level + levels)

    LevelReduceInPlace = LevelReduce

    def Compress(self, ct: Ciphertext, towers_left: int = 1) -> Ciphertext:
        """Reduce to `towers_left` towers before transmission
        (reference cryptocontext.h:2581). With composite scaling the drop
        rounds down to a whole number of levels."""
        if ct.noise_deg == 2:
            ct = self.ModReduce(ct)
        d = getattr(self, "comp_deg", 1)
        drop = (self.size_ql(ct.level) - towers_left) // d
        return self.LevelReduce(ct, drop) if drop > 0 else ct

    # ------------------------------------------------------------------
    # rotations (reference EvalRotate/EvalAtIndex, cryptocontext.h:2302)
    # ------------------------------------------------------------------

    def _auto_idx(self, g: int):
        """Device-cached automorphism gather table for exponent g."""
        cache = self.__dict__.setdefault("_auto_idx_cache", {})
        v = cache.get(g)
        if v is None:
            v = cache[g] = jnp.asarray(eval_indices(self.ring_dim, g))
        return v

    def EvalAutomorphism(self, ct: Ciphertext, g: int) -> Ciphertext:
        idx = self._auto_idx(g)
        ek = self.eval_automorphism_keys[ct.key_tag][g]
        if (self.params.ks_technique == KeySwitchTechnique.HYBRID
                and len(ct.elements) == 2):
            e0, e1 = _k_automorph_hybrid(
                tuple(ct.elements), idx, ek,
                self.hybrid_tables(self.size_ql(ct.level)))
            return ct.replace(elements=(e0, e1))
        rot = [jnp.take(c, idx, axis=-1) for c in ct.elements]
        d0, d1 = self._keyswitch_core(rot[1], ek, self.size_ql(ct.level))
        basis = self.basis_at(ct.level)
        return ct.replace(elements=(mo.add_mod(rot[0], d0, basis.q), d1))

    def EvalRotate(self, ct: Ciphertext, index: int) -> Ciphertext:
        g = rotation_automorphism_index(index, self.ring_dim)
        return self.EvalAutomorphism(ct, g)

    EvalAtIndex = EvalRotate

    def EvalConjugate(self, ct: Ciphertext) -> Ciphertext:
        return self.EvalAutomorphism(ct, conjugation_index(self.ring_dim))

    # ------------------------------------------------------------------
    # hoisted rotations (reference EvalFastRotationPrecompute /
    # EvalFastRotation, cryptocontext.h:2331-2410)
    # ------------------------------------------------------------------

    def EvalFastRotationPrecompute(self, ct: Ciphertext):
        """Digit-decompose c1 once; share across many rotations."""
        if self.params.ks_technique != KeySwitchTechnique.HYBRID:
            return None
        tabs = self.hybrid_tables(self.size_ql(ct.level))
        return hybrid.eval_fast_rotation_precompute(ct.elements[1], tabs)

    def EvalFastRotation(self, ct: Ciphertext, index: int, m: int = 0,
                         digits=None) -> Ciphertext:
        """Rotation using hoisted digits (falls back to EvalRotate when
        hoisting is unavailable)."""
        if digits is None:
            return self.EvalRotate(ct, index)
        g = rotation_automorphism_index(index, self.ring_dim)
        return self._fast_automorphism(ct, g, digits)

    def _fast_automorphism(self, ct: Ciphertext, g: int,
                           digits) -> Ciphertext:
        ek = self.eval_automorphism_keys[ct.key_tag][g]
        tabs = self.hybrid_tables(self.size_ql(ct.level))
        d0, d1 = hybrid.eval_fast_rotation_core(digits, g, ek, tabs,
                                                self.ring_dim)
        idx = jnp.asarray(eval_indices(self.ring_dim, g))
        c0_rot = jnp.take(ct.elements[0], idx, axis=-1)
        basis = self.basis_at(ct.level)
        return ct.replace(elements=(mo.add_mod(c0_rot, d0, basis.q), d1))

    # ------------------------------------------------------------------
    # generic key switching + extended-basis (QP) variants (reference
    # KeySwitch/KeySwitchExt/KeySwitchDown, cryptocontext.h:1680-1720 and
    # keyswitch-hybrid.cpp EvalFastKeySwitchCoreExt)
    # ------------------------------------------------------------------

    def KeySwitch(self, ct: Ciphertext, ek) -> Ciphertext:
        """Switch a 2-element ciphertext to the key `ek` targets
        (reference KeySwitch, cryptocontext.h:1685)."""
        basis = self.basis_at(ct.level)
        d0, d1 = self._keyswitch_core(ct.elements[1], ek,
                                      self.size_ql(ct.level))
        return ct.replace(
            elements=(mo.add_mod(ct.elements[0], d0, basis.q), d1),
            key_tag=ek.key_tag)

    KeySwitchInPlace = KeySwitch

    def KeySwitchExt(self, ct: Ciphertext,
                     add_first: bool = True) -> Ciphertext:
        """Raise every element to the extended basis Q_l*P (multiply by
        P); with add_first=False element 0 is left zero, to be re-added
        after KeySwitchDownFirstElement (reference KeySwitchExt)."""
        tabs = self.hybrid_tables(self.size_ql(ct.level))
        elems = [hybrid.raise_c0_ext(c, self.p_modq, self.p_modq_sh, tabs)
                 for c in ct.elements]
        if not add_first:
            elems[0] = jnp.zeros_like(elems[0])
        return ct.replace(elements=tuple(elems)).SetMetadataByKey(
            "ext_basis", True)

    def EvalFastRotationExt(self, ct: Ciphertext, index: int, digits,
                            add_first: bool = True) -> Ciphertext:
        """Hoisted rotation left in the extended basis (reference
        EvalFastRotationExt, cryptocontext.h:2412): accumulate many with
        EvalAddExt, then one KeySwitchDown — one ApproxModDown amortizes
        an entire rotation ladder."""
        g = rotation_automorphism_index(index, self.ring_dim)
        ek = self.eval_automorphism_keys[ct.key_tag][g]
        tabs = self.hybrid_tables(self.size_ql(ct.level))
        e0, e1 = hybrid.eval_fast_rotation_core_ext(digits, g, ek, tabs,
                                                    self.ring_dim)
        if add_first:
            idx = jnp.asarray(eval_indices(self.ring_dim, g))
            c0_rot = jnp.take(ct.elements[0], idx, axis=-1)
            e0 = mo.add_mod(e0, hybrid.raise_c0_ext(
                c0_rot, self.p_modq, self.p_modq_sh, tabs),
                tabs.basis_qlp.q)
        return ct.replace(elements=(e0, e1)).SetMetadataByKey(
            "ext_basis", True)

    def EvalAddExt(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """Elementwise add of extended-basis ciphertexts (reference
        EvalAddExt)."""
        q = self.hybrid_tables(self.size_ql(a.level)).basis_qlp.q
        return a.replace(elements=tuple(
            mo.add_mod(x, y, q) for x, y in zip(a.elements, b.elements)))

    def EvalSubExt(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        q = self.hybrid_tables(self.size_ql(a.level)).basis_qlp.q
        return a.replace(elements=tuple(
            mo.sub_mod(x, y, q) for x, y in zip(a.elements, b.elements)))

    def KeySwitchDown(self, ct: Ciphertext) -> Ciphertext:
        """ApproxModDown an extended-basis ciphertext back to Q_l
        (reference KeySwitchDown)."""
        tabs = self.hybrid_tables(self.size_ql(ct.level))
        out0, out1 = hybrid.mod_down_pair(ct.elements[0], ct.elements[1],
                                          tabs)
        return ct.replace(elements=(out0, out1)).SetMetadataByKey(
            "ext_basis", False)

    def KeySwitchDownFirstElement(self, ct: Ciphertext) -> jnp.ndarray:
        """Mod-down only element 0 of an extended ciphertext (reference
        KeySwitchDownFirstElement); returns the raw [k, N] tensor."""
        tabs = self.hybrid_tables(self.size_ql(ct.level))
        return hybrid.mod_down_first(ct.elements[0], tabs)


    # ------------------------------------------------------------------
    # PRE (reference: ReKeyGen/ReEncrypt, cryptocontext.h:3043)
    # ------------------------------------------------------------------

    def ReKeyGen(self, old_sk, new_key):
        from openfhe_tpu.pke import pre
        return pre.re_key_gen(self, old_sk, new_key)

    def ReEncrypt(self, ct, re_key, public_key=None):
        from openfhe_tpu.pke import pre
        return pre.re_encrypt(self, ct, re_key, public_key)

    # ------------------------------------------------------------------
    # Multiparty (reference: cryptocontext.h:3088-3151)
    # ------------------------------------------------------------------

    def MultipartyKeyGen(self, prev_pk=None):
        from openfhe_tpu.pke import multiparty
        return multiparty.multiparty_key_gen(self, prev_pk)

    def MultipartyDecryptLead(self, cts, sk):
        from openfhe_tpu.pke import multiparty
        if isinstance(cts, (list, tuple)):
            return [multiparty.multiparty_decrypt_lead(self, c, sk)
                    for c in cts]
        return multiparty.multiparty_decrypt_lead(self, cts, sk)

    def MultipartyDecryptMain(self, cts, sk):
        from openfhe_tpu.pke import multiparty
        if isinstance(cts, (list, tuple)):
            return [multiparty.multiparty_decrypt_main(self, c, sk)
                    for c in cts]
        return multiparty.multiparty_decrypt_main(self, cts, sk)

    def MultipartyDecryptFusion(self, partials, ct_meta=None):
        from openfhe_tpu.pke import multiparty
        return multiparty.multiparty_decrypt_fusion(
            self, partials, ct_meta or partials[0])

    def MultiAddPubKeys(self, pk1, pk2, key_tag: str = ""):
        """Sum two public-key shares over a common random `a` (reference
        MultiAddPubKeys, cryptocontext.h:3337)."""
        b = mo.add_mod(pk1.b, pk2.b, self.basis_qp.q)
        from openfhe_tpu.pke.keys import PublicKey
        return PublicKey(b=b, a=pk1.a, key_tag=key_tag or pk1.key_tag)

    def MultiKeySwitchGen(self, original_sk, new_sk, ek_prev):
        from openfhe_tpu.pke import multiparty
        return multiparty.multi_key_switch_gen(self, original_sk, new_sk,
                                               ek_prev)

    def MultiAddEvalKeys(self, ek1, ek2, key_tag=""):
        from openfhe_tpu.pke import multiparty
        return multiparty.multi_add_evalkeys(self, ek1, ek2, key_tag)

    def MultiMultEvalKey(self, ek, sk, key_tag=""):
        from openfhe_tpu.pke import multiparty
        return multiparty.multi_mult_eval_key(self, ek, sk, key_tag)

    def MultiAddEvalMultKeys(self, ek1, ek2, key_tag=""):
        from openfhe_tpu.pke import multiparty
        return multiparty.multi_add_evalmult_keys(self, ek1, ek2, key_tag)

    def MultiEvalAutomorphismKeyGen(self, sk, ek_prev_map, g_list,
                                    key_tag=""):
        from openfhe_tpu.pke import multiparty
        return multiparty.multi_eval_automorphism_keygen(
            self, sk, ek_prev_map, g_list, key_tag)

    def MultiAddAutomorphismKeys(self, m1, m2, key_tag=""):
        from openfhe_tpu.pke import multiparty
        return multiparty.multi_add_automorphism_keys(self, m1, m2, key_tag)

    def ShareKeys(self, sk, num_parties, threshold, seed=0):
        from openfhe_tpu.pke import multiparty
        return multiparty.share_keys(self, sk, num_parties, threshold, seed)

    def RecoverSharedKey(self, shares, key_tag=""):
        from openfhe_tpu.pke import multiparty
        return multiparty.recover_shared_key(self, shares, key_tag)

    # Interactive (2-round) bootstrapping
    # (reference: cryptocontext.h IntBoot*/IntMPBoot*)

    def IntBootAdjustScale(self, ct):
        from openfhe_tpu.pke import multiparty
        return multiparty.int_boot_adjust_scale(self, ct)

    def IntBootDecrypt(self, sk, ct):
        from openfhe_tpu.pke import multiparty
        return multiparty.int_boot_decrypt(self, sk, ct)

    def IntBootEncrypt(self, pk, ct_share):
        from openfhe_tpu.pke import multiparty
        return multiparty.int_boot_encrypt(self, pk, ct_share)

    def IntBootAdd(self, ct1, ct2):
        from openfhe_tpu.pke import multiparty
        return multiparty.int_boot_add(self, ct1, ct2)

    def IntMPBootAdjustScale(self, ct):
        from openfhe_tpu.pke import multiparty
        return multiparty.int_mp_boot_adjust_scale(self, ct)

    def IntMPBootRandomElementGen(self, pk):
        from openfhe_tpu.pke import multiparty
        return multiparty.int_mp_boot_random_element_gen(self, pk)

    def IntMPBootDecrypt(self, sk, ct, a):
        from openfhe_tpu.pke import multiparty
        return multiparty.int_mp_boot_decrypt(self, sk, ct, a)

    def IntMPBootAdd(self, shares_vec):
        from openfhe_tpu.pke import multiparty
        return multiparty.int_mp_boot_add(self, shares_vec)

    def IntMPBootEncrypt(self, pk, shares, a, ct):
        from openfhe_tpu.pke import multiparty
        return multiparty.int_mp_boot_encrypt(self, pk, shares, a, ct)

    def InsertEvalMultKey(self, ek, key_tag=None):
        self.eval_mult_keys[key_tag or ek.key_tag] = ek

    def InsertEvalAutomorphismKey(self, key_map, key_tag):
        self.eval_automorphism_keys.setdefault(key_tag, {}).update(key_map)

    def InsertEvalSumKey(self, key_map, key_tag):
        """Sum keys are rotation (automorphism) keys (reference
        cryptocontext.h InsertEvalSumKey)."""
        self.InsertEvalAutomorphismKey(key_map, key_tag)

    # key-store management (reference cryptocontext.h:243-245 static maps;
    # ours are per-context, so Clear* drops this context's stores)
    def ClearEvalMultKeys(self, key_tag: str | None = None) -> None:
        if key_tag is None:
            self.eval_mult_keys.clear()
        else:
            self.eval_mult_keys.pop(key_tag, None)

    def ClearEvalAutomorphismKeys(self, key_tag: str | None = None) -> None:
        if key_tag is None:
            self.eval_automorphism_keys.clear()
        else:
            self.eval_automorphism_keys.pop(key_tag, None)

    ClearEvalSumKeys = ClearEvalAutomorphismKeys

    def ClearStaticMapsAndVectors(self) -> None:
        self.ClearEvalMultKeys()
        self.ClearEvalAutomorphismKeys()
        self.eval_sum_keys.clear()

    # ------------------------------------------------------------------
    # AdvancedSHE delegation (reference: cryptocontext.h EvalSum etc.)
    # ------------------------------------------------------------------

    def EvalAddMany(self, cts):
        from openfhe_tpu.pke import advanced
        return advanced.eval_add_many(self, cts)

    def EvalMultMany(self, cts):
        from openfhe_tpu.pke import advanced
        return advanced.eval_mult_many(self, cts)

    def EvalLinearWSum(self, cts, weights):
        from openfhe_tpu.pke import advanced
        return advanced.eval_linear_wsum(self, cts, weights)

    def EvalSumKeyGen(self, sk, batch_size=None):
        from openfhe_tpu.pke import advanced
        advanced.eval_sum_keygen(self, sk, batch_size)
        self.eval_sum_keys[sk.key_tag] = True

    def EvalSum(self, ct, batch_size=None):
        from openfhe_tpu.pke import advanced
        return advanced.eval_sum(self, ct, batch_size)

    def EvalSumRowsKeyGen(self, sk, row_size, batch):
        from openfhe_tpu.pke import advanced
        advanced.eval_sum_rows_keygen(self, sk, row_size, batch)

    def EvalSumRows(self, ct, row_size, batch=None):
        from openfhe_tpu.pke import advanced
        return advanced.eval_sum_rows(self, ct, row_size, batch)

    def EvalSumColsKeyGen(self, sk, row_size):
        from openfhe_tpu.pke import advanced
        advanced.eval_sum_cols_keygen(self, sk, row_size)

    def EvalSumCols(self, ct, row_size):
        from openfhe_tpu.pke import advanced
        return advanced.eval_sum_cols(self, ct, row_size)

    def EvalInnerProduct(self, ct1, ct2, batch_size=None):
        from openfhe_tpu.pke import advanced
        return advanced.eval_inner_product(self, ct1, ct2, batch_size)

    def EvalMerge(self, cts):
        from openfhe_tpu.pke import advanced
        return advanced.eval_merge(self, cts)

    def EvalPowers(self, ct, coefficients):
        """(reference cryptocontext.h:2716) reusable power basis."""
        from openfhe_tpu.pke import advanced
        return advanced.eval_powers(self, ct, coefficients)

    def EvalPolyWithPrecomp(self, powers, coefficients):
        from openfhe_tpu.pke import advanced
        return advanced.eval_poly_with_precomp(self, powers, coefficients)

    def EvalPolyPS(self, ct, coeffs):
        """(reference EvalPolyPS) power-basis evaluation, log-depth."""
        from openfhe_tpu.pke import advanced
        return advanced.eval_poly_linear(self, ct, coeffs)

    def EvalChebyPolys(self, ct, coefficients, a: float = -1.0,
                       b: float = 1.0):
        """(reference cryptocontext.h:2793) reusable Chebyshev basis."""
        from openfhe_tpu.pke import advanced
        return advanced.eval_cheby_polys(self, ct, coefficients, a, b)

    def EvalChebyshevSeriesWithPrecomp(self, basis, coefficients):
        from openfhe_tpu.pke import advanced
        return advanced.eval_chebyshev_series_with_precomp(self, basis,
                                                           coefficients)

    def EvalPoly(self, ct, coeffs):
        from openfhe_tpu.pke import advanced
        return advanced.eval_poly(self, ct, coeffs)

    def EvalPolyLinear(self, ct, coeffs):
        from openfhe_tpu.pke import advanced
        return advanced.eval_poly_linear(self, ct, coeffs)

    EvalPolyPS = EvalPoly

    def EvalChebyshevSeries(self, ct, coeffs, a, b):
        from openfhe_tpu.pke import advanced
        return advanced.eval_chebyshev_series(self, ct, coeffs, a, b)

    def EvalChebyshevSeriesLinear(self, ct, coeffs, a, b):
        from openfhe_tpu.pke import advanced
        return advanced.eval_chebyshev_series_linear(self, ct, coeffs, a, b)

    def EvalChebyshevSeriesPS(self, ct, coeffs, a, b):
        from openfhe_tpu.pke import advanced
        return advanced.eval_chebyshev_series_ps(self, ct, coeffs, a, b)

    def EvalChebyshevFunction(self, func, ct, a, b, degree):
        from openfhe_tpu.pke import advanced
        return advanced.eval_chebyshev_function(self, func, ct, a, b, degree)

    def EvalSin(self, ct, a, b, degree):
        from openfhe_tpu.pke import advanced
        return advanced.eval_sin(self, ct, a, b, degree)

    def EvalCos(self, ct, a, b, degree):
        from openfhe_tpu.pke import advanced
        return advanced.eval_cos(self, ct, a, b, degree)

    def EvalLogistic(self, ct, a, b, degree):
        from openfhe_tpu.pke import advanced
        return advanced.eval_logistic(self, ct, a, b, degree)

    def EvalDivide(self, ct, a, b, degree):
        from openfhe_tpu.pke import advanced
        return advanced.eval_divide(self, ct, a, b, degree)

    # ------------------------------------------------------------------
    # CKKS bootstrapping (reference: cryptocontext.h:3513-3548)
    # ------------------------------------------------------------------

    def GetBootstrapDepth(self, level_budget=(1, 1)) -> int:
        """(reference FHECKKSRNS::GetBootstrapDepth)"""
        from openfhe_tpu.pke.fhe import ckks_bootstrap as bt
        return bt.get_bootstrap_depth(level_budget,
                                      self.params.secret_key_dist,
                                      self.ring_dim)

    def EvalBootstrapSetup(self, level_budget=(1, 1), dim1=(0, 0),
                           slots: int = 0, correction_factor: int = 0):
        from openfhe_tpu.pke.fhe import ckks_bootstrap as bt
        if correction_factor == 0:
            correction_factor = getattr(self, "_boot_correction_override", 0)
        self._boot_setup_args = (level_budget, dim1, correction_factor)
        bt.eval_bootstrap_setup(self, level_budget, dim1, slots,
                                correction_factor)

    def EvalBootstrapPrecompute(self, slots: int = 0):
        """Re-run the plaintext precompute for another slot count, reusing
        the Setup's level budgets (reference EvalBootstrapPrecompute,
        cryptocontext.h:3526)."""
        from openfhe_tpu.pke.fhe import ckks_bootstrap as bt
        args = getattr(self, "_boot_setup_args", None)
        if args is None:
            raise RuntimeError("call EvalBootstrapSetup first")
        level_budget, dim1, correction = args
        bt.eval_bootstrap_setup(self, level_budget, dim1, slots, correction)

    def EvalBootstrapKeyGen(self, sk, slots: int = 0):
        from openfhe_tpu.pke.fhe import ckks_bootstrap as bt
        bt.eval_bootstrap_keygen(self, sk, slots)

    def EvalBootstrap(self, ct, num_iterations: int = 1, precision: int = 0):
        from openfhe_tpu.pke.fhe import ckks_bootstrap as bt
        return bt.eval_bootstrap(self, ct, num_iterations, precision)

    def EvalBootstrapStCFirst(self, ct, num_iterations: int = 1,
                              precision: int = 0):
        """Slots-encoding bootstrap: SlotsToCoeffs first, output stays in
        slot form (reference EvalBootstrapStCFirst, ckksrns-fhe.cpp:839)."""
        from openfhe_tpu.pke.fhe import ckks_bootstrap as bt
        return bt.eval_bootstrap_stc_first(self, ct, num_iterations,
                                           precision)

    # ------------------------------------------------------------------
    # vectorized functional bootstrapping (reference: cryptocontext.h:3568
    # EvalFBT / EvalMVB, via the RLWE schemelet)
    # ------------------------------------------------------------------

    def EvalFBTSetup(self, num_slots: int = 0, p_in: int = 8,
                     correction_factor: int = 0):
        from openfhe_tpu.pke.fhe import fbt
        fbt.eval_fbt_setup(self, num_slots, p_in, correction_factor)

    def EvalFBTKeyGen(self, sk, slots: int = 0):
        from openfhe_tpu.pke.fhe import fbt
        fbt.eval_fbt_keygen(self, sk, slots)

    def EvalFBT(self, ct, lut, p_in: int, decode: bool = True,
                p_out: int = 0):
        from openfhe_tpu.pke.fhe import fbt
        return fbt.eval_fbt(self, ct, lut, p_in, decode, p_out)

    def EvalFBTNoDecoding(self, ct, lut, p_in: int):
        """(reference cryptocontext.h:3576) FBT leaving the result in
        slot form."""
        from openfhe_tpu.pke.fhe import fbt
        return fbt.eval_fbt(self, ct, lut, p_in, decode=False)

    def EvalMVBPrecompute(self, ct, p_in: int):
        """(reference cryptocontext.h:3588) shared exponential powers for
        multi-value bootstrapping."""
        from openfhe_tpu.pke.fhe import fbt
        return fbt.eval_mvb_precompute(self, ct, p_in)

    def EvalMVB(self, powers, lut, p_in: int, decode: bool = True,
                p_out: int = 0):
        """(reference cryptocontext.h:3596) evaluate one LUT against
        precomputed powers — many LUTs amortize one bootstrap."""
        from openfhe_tpu.pke.fhe import fbt
        return fbt.eval_mvb(self, powers, lut, p_in, decode, p_out)

    def EvalMVBNoDecoding(self, powers, lut, p_in: int):
        from openfhe_tpu.pke.fhe import fbt
        return fbt.eval_mvb(self, powers, lut, p_in, decode=False)

    def EvalHomDecoding(self, ct, p_out: int, slots: int | None = None):
        """(reference cryptocontext.h:3585)"""
        from openfhe_tpu.pke.fhe import fbt
        return fbt.eval_hom_decoding(self, ct, p_out, slots)

    def EvalHermiteTrigSeries(self, ct_exp, func, p: int, order: int = 1,
                              scale: float = 1.0):
        """Evaluate a Hermite trigonometric interpolation of `func` on a
        ciphertext encrypting exp(2*pi*i*x/p) (reference
        EvalHermiteTrigSeries, cryptocontext.h:3609; coefficients from
        math/hermite.py; the real part of the result is func(x))."""
        from openfhe_tpu.math.hermite import get_hermite_trig_coefficients
        from openfhe_tpu.pke import advanced
        coeffs = get_hermite_trig_coefficients(func, p, order, scale)
        return advanced.eval_poly_linear(self, ct_exp,
                                         [complex(c) for c in coeffs])

    # ------------------------------------------------------------------
    # CKKS <-> FHEW scheme switching (reference: cryptocontext.h:3653-3753)
    # ------------------------------------------------------------------

    def EvalCKKStoFHEWSetup(self, params=None):
        from openfhe_tpu.pke import schemeswitch as ssw
        return ssw.eval_ckks_to_fhew_setup(self, params or
                                           ssw.SchSwchParams())

    def EvalCKKStoFHEWKeyGen(self, keys, lwe_sk):
        from openfhe_tpu.pke import schemeswitch as ssw
        ssw.eval_ckks_to_fhew_keygen(self, keys, lwe_sk)

    def EvalCKKStoFHEWPrecompute(self, scale: float = 1.0):
        from openfhe_tpu.pke import schemeswitch as ssw
        ssw.eval_ckks_to_fhew_precompute(self, scale)

    def EvalCKKStoFHEW(self, ct, num_ctxts: int = 0):
        from openfhe_tpu.pke import schemeswitch as ssw
        return ssw.eval_ckks_to_fhew(self, ct, num_ctxts)

    def EvalFHEWtoCKKSKeyGen(self, keys, lwe_sk):
        from openfhe_tpu.pke import schemeswitch as ssw
        ssw.eval_fhew_to_ckks_keygen(self, keys, lwe_sk)

    def EvalFHEWtoCKKS(self, lwe_cts, num_ctxts: int = 0,
                       num_slots: int = 0, p: int = 4, pmin: float = 0.0,
                       pmax: float = 2.0):
        from openfhe_tpu.pke import schemeswitch as ssw
        return ssw.eval_fhew_to_ckks(self, lwe_cts, num_ctxts, num_slots,
                                     p, pmin, pmax)

    def EvalSchemeSwitchingSetup(self, params=None):
        return self.EvalCKKStoFHEWSetup(params)

    def EvalFHEWtoCKKSSetup(self, cc_lwe=None, num_slots: int = 0,
                            logq: int = 25):
        """(reference EvalFHEWtoCKKSSetup, cryptocontext.h:3734) — the
        shared switching state covers both directions here; this wires an
        existing BinFHE context in when provided."""
        if getattr(self, "_schswch", None) is None:
            self.EvalCKKStoFHEWSetup(None)
        if cc_lwe is not None:
            self._schswch.cc_lwe = cc_lwe

    def EvalSchemeSwitchingKeyGen(self, keys, lwe_sk):
        self.EvalCKKStoFHEWKeyGen(keys, lwe_sk)
        self.EvalFHEWtoCKKSKeyGen(keys, lwe_sk)

    def EvalCompareSwitchPrecompute(self, p_lwe: int = 0,
                                    scale_sign: float = 1.0):
        from openfhe_tpu.pke import schemeswitch as ssw
        ssw.eval_compare_switch_precompute(self, p_lwe, scale_sign)

    def EvalCompareSchemeSwitching(self, ct1, ct2, num_ctxts: int = 0,
                                   num_slots: int = 0):
        from openfhe_tpu.pke import schemeswitch as ssw
        return ssw.eval_compare_scheme_switching(self, ct1, ct2, num_ctxts,
                                                 num_slots)

    def EvalMinSchemeSwitching(self, ct, public_key, num_values: int,
                               num_slots: int = 0, p_lwe: int = 0,
                               scale_sign: float = 1.0):
        from openfhe_tpu.pke import schemeswitch as ssw
        return ssw.eval_min_scheme_switching(self, ct, public_key,
                                             num_values, num_slots, p_lwe,
                                             scale_sign)

    def EvalMaxSchemeSwitching(self, ct, public_key, num_values: int,
                               num_slots: int = 0, p_lwe: int = 0,
                               scale_sign: float = 1.0):
        from openfhe_tpu.pke import schemeswitch as ssw
        return ssw.eval_max_scheme_switching(self, ct, public_key,
                                             num_values, num_slots, p_lwe,
                                             scale_sign)

    # The reference's *Alt variants (cryptocontext.h:3810-3850) trade one
    # extra level for fewer scheme switches on large value counts; our
    # tournament implementation already batches all comparisons per round,
    # so both entry points share it.
    EvalMinSchemeSwitchingAlt = EvalMinSchemeSwitching
    EvalMaxSchemeSwitchingAlt = EvalMaxSchemeSwitching

    def GetBinCCForSchemeSwitch(self):
        return self._schswch.cc_lwe

    def SetBinCCForSchemeSwitch(self, cc_lwe) -> None:
        """Rebind the inner BinFHE context after deserializing
        scheme-switching state (reference cryptocontext.h:3944)."""
        self._schswch.cc_lwe = cc_lwe

    def GetSwkFC(self):
        """FHEW->CKKS switch key — the CKKS encryption of the LWE secret
        (reference cryptocontext.h:3954)."""
        return self._schswch.fhew_to_ckks_swk

    def SetSwkFC(self, swk) -> None:
        self._schswch.fhew_to_ckks_swk = swk

    # debugging aid (reference cryptocontext.h:469-482: store the secret
    # key in the context for noise-inspection workflows; here it is always
    # available rather than gated on a compile flag)
    def SetPrivateKey(self, sk) -> None:
        self._debug_private_key = sk

    def GetPrivateKey(self):
        return getattr(self, "_debug_private_key", None)


def GenCryptoContext(params: prm.CCParams, seed: int = 0) -> CryptoContext:
    """(reference: gen-cryptocontext.h:88-92)"""
    return CryptoContext(params, seed=seed)
