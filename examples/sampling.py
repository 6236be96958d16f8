"""Integer discrete-Gaussian sampling demo.

Port of the reference core example (src/core/examples/sampling.cpp:40-129):
times rejection sampling, Karney's exact method, and the generic
(Peikert / Knuth-Yao base-sampler) discrete Gaussian over a sweep of
1024 coset centers, mirroring the reference's sampler inventory
(math/dgg.py, math/dgg_generic.py).

The TPU design keeps these exact host samplers for key material /
trapdoor sampling (security-sensitive, latency-insensitive) while bulk
error sampling rides the device threefry path (math/sampling.py).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import time

from openfhe_tpu.math.dgg import DiscreteGaussianGenerator
from openfhe_tpu.math.dgg_generic import (BaseSampler, BitGenerator,
                                          DiscreteGaussianGeneratorGeneric)

STD_BASE = 34
STD = float(1 << 22)
CENTER_COUNT = 64          # reference uses 1024; scaled for a quick demo
COUNT = 50                 # samples per center (reference: 1000)
SMOOTHING = 6


def main():
    print(f"Distribution parameter = {STD}")

    bg = BitGenerator()
    dgg = DiscreteGaussianGenerator(4)
    dgg_rej = DiscreteGaussianGenerator(4)

    print("Started creating base samplers")
    peikert = [BaseSampler(i / CENTER_COUNT, STD_BASE, bg, "PEIKERT")
               for i in range(CENTER_COUNT)]
    ky = [BaseSampler(i / CENTER_COUNT, STD_BASE, bg, "KNUTH_YAO")
          for i in range(CENTER_COUNT)]
    print("Ended creating base samplers, Started sampling")

    t0 = time.perf_counter()
    for k in range(CENTER_COUNT):
        c = k / CENTER_COUNT
        for _ in range(COUNT):
            dgg_rej.GenerateInteger(c, STD)
    dt = (time.perf_counter() - t0) * 1e3 / CENTER_COUNT
    print(f"Sampling {COUNT} integers (Rejection): {dt:.3f} ms")

    t0 = time.perf_counter()
    for k in range(CENTER_COUNT):
        c = k / CENTER_COUNT
        for _ in range(COUNT):
            dgg.GenerateIntegerKarney(c, STD)
    dt = (time.perf_counter() - t0) * 1e3 / CENTER_COUNT
    print(f"Sampling {COUNT} integers (Karney): {dt:.3f} ms")

    import math
    base = int(math.log2(CENTER_COUNT))
    gen_p = DiscreteGaussianGeneratorGeneric(peikert, STD_BASE, base,
                                             SMOOTHING)
    t0 = time.perf_counter()
    for k in range(CENTER_COUNT):
        c = k / CENTER_COUNT
        for _ in range(COUNT):
            gen_p.generate_integer(c, STD)
    dt = (time.perf_counter() - t0) * 1e3 / CENTER_COUNT
    print(f"Sampling {COUNT} integers (Generic - Peikert): {dt:.3f} ms")

    gen_k = DiscreteGaussianGeneratorGeneric(ky, STD_BASE, base, SMOOTHING)
    t0 = time.perf_counter()
    for k in range(CENTER_COUNT):
        c = k / CENTER_COUNT
        for _ in range(COUNT):
            gen_k.generate_integer(c, STD)
    dt = (time.perf_counter() - t0) * 1e3 / CENTER_COUNT
    print(f"Sampling {COUNT} integers (Generic - Knuth Yao): {dt:.3f} ms")


if __name__ == "__main__":
    main()
