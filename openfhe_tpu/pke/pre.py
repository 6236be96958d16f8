"""Proxy re-encryption (PRE).

Reference analog: /root/reference src/pke/lib/schemebase/base-pre.cpp and
rns-pre.cpp: ReKeyGen = key-switch key from the delegator's secret to the
delegatee's key; ReEncrypt applies it. Modes (constants-defs.h:63-68):
INDCPA (plain switch), FIXED_NOISE_HRA (re-randomize with an encryption of
zero), NOISE_FLOODING_HRA (add large flooding noise).
"""

from __future__ import annotations

import jax

from openfhe_tpu.math import modops as mo
from openfhe_tpu.math import sampling
from openfhe_tpu.ops.ntt import ntt_fwd
from openfhe_tpu.pke.ciphertext import Ciphertext
from openfhe_tpu.pke.constants import ProxyReEncryptionMode
from openfhe_tpu.pke.keys import EvalKey, PrivateKey, PublicKey
from openfhe_tpu.pke.keyswitch import hybrid
from openfhe_tpu.pke.schemes import rns_pke

NOISE_FLOODING_BITS = 20  # per-level flooding magnitude on 31-bit towers


def re_key_gen(cc, old_sk: PrivateKey, new_key) -> EvalKey:
    """(reference: CryptoContextImpl::ReKeyGen, cryptocontext.h:3043)"""
    ns = getattr(cc, "noise_scale_int", 1)
    if isinstance(new_key, PrivateKey):
        return cc.KeySwitchGen(old_sk, new_key)
    assert isinstance(new_key, PublicKey)
    return hybrid.keyswitch_gen_pk(
        cc.next_rng(), old_sk, new_key, cc.basis_qp, len(cc.moduli_q),
        cc.params.num_large_digits, cc.p_modq, cc.p_modq_sh, ns_int=ns)


def re_encrypt(cc, ct: Ciphertext, re_key: EvalKey,
               public_key: PublicKey | None = None) -> Ciphertext:
    """(reference: ReEncrypt) switch (c0, c1) under the re-encryption key."""
    tabs = cc.hybrid_tables(cc.size_ql(ct.level))
    basis = tabs.basis_ql
    d0, d1 = hybrid.keyswitch_core(ct.elements[1], re_key, tabs)
    c0 = mo.add_mod(ct.elements[0], d0, basis.q)
    c1 = d1
    mode = cc.params.pre_mode
    if mode == ProxyReEncryptionMode.FIXED_NOISE_HRA and public_key is not None:
        z0, z1 = rns_pke.encrypt_zero_pk(cc.next_rng(), public_key, basis,
                                         cc.params.secret_key_dist,
                                         ns_int=getattr(cc, "noise_scale_int",
                                                        1))
        c0 = mo.add_mod(c0, z0, basis.q)
        c1 = mo.add_mod(c1, z1, basis.q)
    elif mode == ProxyReEncryptionMode.NOISE_FLOODING_HRA:
        n = cc.ring_dim
        flood = sampling.discrete_gaussian(
            cc.next_rng(), (n,), sigma=float(1 << NOISE_FLOODING_BITS))
        ns = getattr(cc, "noise_scale_int", 1)
        ef = sampling.to_residues(flood, basis)
        if ns != 1:
            # multiply by t modularly AFTER residue lifting (t * flood
            # overflows int32 for large flooding sigma)
            from openfhe_tpu.lattice import rns_tools as rt
            c, c_sh = rt._shoup_pair([ns % q for q in basis.moduli],
                                     basis.moduli)
            ef = mo.mul_mod_shoup(ef, c, c_sh, basis.q)
        ef = ntt_fwd(ef, basis)
        c0 = mo.add_mod(c0, ef, basis.q)
    return ct.replace(elements=(c0, c1), key_tag=re_key.key_tag)
