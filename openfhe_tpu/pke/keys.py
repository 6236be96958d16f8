"""Key types.

Reference analog: /root/reference src/pke/include/key/publickey.h:178,
privatekey.h:186, evalkey.h:167, evalkeyrelin.h:214, keypair.h:66.

All keys are pytrees of `[k, N]` uint32 EVAL-format residue tensors plus a
`key_tag` (host string identifying the secret key family, like the
reference's keyTag used to index static eval-key maps).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PrivateKey:
    """Secret key s: residues over the extended basis QP (EVAL)."""
    s_qp: jnp.ndarray                      # [kQ + kP, N]
    key_tag: str = struct.field(pytree_node=False, default="")

    def s_q(self, size_ql: int) -> jnp.ndarray:
        return self.s_qp[:size_ql]


@struct.dataclass
class PublicKey:
    """pk = (b, a) with b = -a*s + e over full Q (EVAL)."""
    b: jnp.ndarray                         # [kQ, N]
    a: jnp.ndarray                         # [kQ, N]
    key_tag: str = struct.field(pytree_node=False, default="")


@struct.dataclass
class EvalKey:
    """Hybrid/BV key-switch key: digit-indexed RLWE encryptions.

    HYBRID: bv/av are [dnum, kQ+kP, N] over QP (keyswitch-hybrid.cpp layout).
    BV:     bv/av are [num_digits, kQ, N] over Q.

    bv_sh/av_sh are optional per-element Shoup companions
    (floor(k * 2^32 / q)) used by the fused TPU keyswitch kernels
    (pke/keyswitch/ks_fused.py); absent on deserialized legacy keys and
    recomputed lazily by the context.
    """
    bv: jnp.ndarray
    av: jnp.ndarray
    bv_sh: jnp.ndarray = None
    av_sh: jnp.ndarray = None
    key_tag: str = struct.field(pytree_node=False, default="")


@struct.dataclass
class KeyPair:
    public_key: PublicKey
    secret_key: PrivateKey

    @property
    def good(self) -> bool:
        return self.public_key is not None and self.secret_key is not None
