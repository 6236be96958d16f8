"""Pluggable PRNG engine demo.

Port of the reference core example (src/core/examples/external-prng.cpp:49-71):
the reference lets a user dlopen an external PRNG library and install it
via PseudoRandomNumberGenerator::InitPRNGEngine; here the analogous hook
is `utils.prng.set_prng_factory`, which swaps the engine behind every
host sampling call (utils/prng.py:60-90).

Run with an argument ("counter") to install a demo external engine;
without one, the built-in BLAKE2b counter engine is used.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from openfhe_tpu.utils import prng


class CountingEngine:
    """A stand-in 'external' PRNG: deterministic counter stream.

    (For demonstration only — never use a non-cryptographic engine for
    real key material.)
    """

    def __init__(self, seed=None, counter=0):
        self._state = counter

    def __call__(self) -> int:
        self._state = (self._state + 0x9E3779B9) & 0xFFFFFFFF
        return self._state

    def random_uint32s(self, count):
        import numpy as np
        return np.array([self() for _ in range(count)], dtype=np.uint32)


def main():
    if len(sys.argv) > 1:
        if sys.argv[1] == "-h":
            print("Usage: external_prng.py [engine-name]")
            print("       with no argument the built-in PRNG is used")
            return
        print("==== Using external PRNG")
        prng.set_prng_factory(CountingEngine)
    else:
        print("==== Using the built-in BLAKE2b PRNG")

    engine = prng.get_prng()
    draws = [engine() % 11 for _ in range(5)]
    print("5 draws in [0, 10]:", draws)

    # restore the default engine for any code that runs after us
    prng.set_prng_factory(None)


if __name__ == "__main__":
    main()
