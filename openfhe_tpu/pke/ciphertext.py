"""Ciphertext type + metadata.

Reference analog: /root/reference src/pke/include/ciphertext.h:60-99
(CiphertextImpl with m_slots, m_level, m_noiseScaleDeg, m_scalingFactor,
m_encodingType, m_metadataMap).

A ciphertext is a tuple of `[k, N]` uint32 EVAL residue tensors (k towers at
the current level) plus static host metadata. Metadata is aux data, so jitted
pipelines specialize per (level, noise_deg) — a handful of variants — while
the tensor math stays traced.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Ciphertext:
    elements: tuple                         # tuple of [k, N] uint32, EVAL
    level: int = struct.field(pytree_node=False, default=0)
    noise_deg: int = struct.field(pytree_node=False, default=1)
    scale: float = struct.field(pytree_node=False, default=1.0)
    slots: int = struct.field(pytree_node=False, default=0)
    key_tag: str = struct.field(pytree_node=False, default="")
    encoding: str = struct.field(pytree_node=False, default="CKKS_PACKED")
    # integer scaling factor (BGV/BFV bookkeeping; reference scalingFactorInt)
    scale_int: int = struct.field(pytree_node=False, default=1)
    # metadata map (reference ciphertext.h m_metadataMap /
    # GetMetadataByKey / SetMetadataByKey): immutable key->value pairs so
    # the struct stays hashable for trace caching; values are arbitrary
    # host-side objects carried through clones untouched.
    metadata: tuple = struct.field(pytree_node=False, default=())

    @property
    def num_towers(self) -> int:
        return self.elements[0].shape[-2]

    @property
    def size(self) -> int:
        return len(self.elements)

    def with_elements(self, elements) -> "Ciphertext":
        return self.replace(elements=tuple(elements))

    # -- metadata map (reference CiphertextImpl::*Metadata*) -------------
    def GetMetadataByKey(self, key: str):
        for k, v in self.metadata:
            if k == key:
                return v
        raise KeyError(f"no metadata for key '{key}'")

    def FindMetadataByKey(self, key: str) -> bool:
        return any(k == key for k, _ in self.metadata)

    def SetMetadataByKey(self, key: str, value) -> "Ciphertext":
        """Returns a new ciphertext with the entry set (functional style)."""
        kept = tuple((k, v) for k, v in self.metadata if k != key)
        return self.replace(metadata=kept + ((key, value),))

    def GetMetadataMap(self) -> dict:
        return dict(self.metadata)

    def Clone(self) -> "Ciphertext":
        return self.replace()

    def CloneZero(self) -> "Ciphertext":
        """Clone metadata but not the payload (reference CloneZero)."""
        return self.replace(elements=tuple(jnp.zeros_like(e)
                                           for e in self.elements))


@struct.dataclass
class Plaintext:
    """Encoded plaintext: residues + the same metadata family.

    Reference analog: src/pke/include/encoding/plaintext.h. Holds the RNS
    encoding of the message at a given level/scale plus the host-side
    decoded view when available.
    """
    poly: jnp.ndarray                       # [k, N] uint32
    fmt: int = struct.field(pytree_node=False, default=1)   # EVAL
    level: int = struct.field(pytree_node=False, default=0)
    noise_deg: int = struct.field(pytree_node=False, default=1)
    scale: float = struct.field(pytree_node=False, default=1.0)
    slots: int = struct.field(pytree_node=False, default=0)
    encoding: str = struct.field(pytree_node=False, default="CKKS_PACKED")
    values: Any = struct.field(pytree_node=False, default=None)  # host view
    scale_int: int = struct.field(pytree_node=False, default=1)
    # log2 of the observed decryption noise (reference GetLogError; filled
    # by Decrypt under EXEC_NOISE_ESTIMATION)
    log_error: float = struct.field(pytree_node=False, default=0.0)

    def GetLogError(self) -> float:
        return self.log_error
