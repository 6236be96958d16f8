"""BLAKE2-based counter-mode PRNG + pluggable PRNG interface.

Reference analog: /root/reference src/core/include/utils/prng/
blake2engine.h (Blake2Engine: BLAKE2b in counter mode, thread-local
instance) and prng.h (pluggable external PRNG via shared library).

TPU-first note: device-side randomness rides jax.random (threefry) —
sampling kernels in math/sampling.py.  This host engine exists for
byte-level parity needs (serialization of seeded streams, deterministic
host-side tests, external-PRNG plugging) and uses the stdlib blake2b.
"""

from __future__ import annotations

import hashlib
import os
import threading

import numpy as np

PRNG_BUFFER_SIZE = 1024        # reference blake2engine.h m_buffer


class Blake2Engine:
    """(reference Blake2Engine) counter-mode BLAKE2b keyed stream of
    uint32 words; API mirrors a C++ UniformRandomBitGenerator."""

    def __init__(self, seed=None, counter: int = 0):
        if seed is None:
            seed = np.frombuffer(os.urandom(64), np.uint8)
        seed = np.asarray(seed, np.uint8).tobytes()[:64]
        self._key = seed.ljust(64, b"\0")
        self._counter = counter
        self._buffer: list = []

    def _refill(self) -> None:
        h = hashlib.blake2b(
            self._counter.to_bytes(8, "little"), key=self._key,
            digest_size=64)
        words = np.frombuffer(h.digest(), np.uint32)
        self._buffer = list(words)
        self._counter += 1

    def __call__(self) -> int:
        """Next uint32 (reference operator())."""
        if not self._buffer:
            self._refill()
        return int(self._buffer.pop())

    def random_uint32s(self, count: int) -> np.ndarray:
        out = np.empty(count, np.uint32)
        for i in range(count):
            out[i] = self()
        return out

    min_value = 0
    max_value = 0xFFFFFFFF


class _PRNGRegistry:
    """Thread-local engine registry (reference
    PseudoRandomNumberGenerator::GetPRNG with external-PRNG plugging)."""

    def __init__(self):
        self._local = threading.local()
        self._factory = Blake2Engine

    def set_factory(self, factory) -> None:
        """Plug an external PRNG (reference InitPRNGEngine)."""
        self._factory = factory
        if hasattr(self._local, "engine"):
            del self._local.engine

    def get(self) -> Blake2Engine:
        if not hasattr(self._local, "engine"):
            self._local.engine = self._factory()
        return self._local.engine


PseudoRandomNumberGenerator = _PRNGRegistry()


def get_prng() -> Blake2Engine:
    return PseudoRandomNumberGenerator.get()


def set_prng_factory(factory) -> None:
    """Install an external PRNG engine class (reference InitPRNGEngine,
    distributiongenerator.h). Pass None to restore the built-in engine."""
    PseudoRandomNumberGenerator.set_factory(factory or Blake2Engine)
