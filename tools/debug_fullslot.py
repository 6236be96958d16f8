"""Diagnose the full-slot bootstrap precision loss (round-4 verdict item 2).

Runs the bench_boot configuration scaled down, on CPU, at a grid of
(N, slots) points, printing the achieved precision bits; then instruments
the failing configuration stage by stage by decrypting intermediates.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from openfhe_tpu.pke.constants import (PKESchemeFeature,  # noqa: E402
                                       ScalingTechnique, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext  # noqa: E402
from openfhe_tpu.pke.parameters import CCParams  # noqa: E402


def run(n, slots, budget=(2, 2), depth=20, verbose=False):
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=n,
                 mult_depth=depth, scaling_mod_size=50, first_mod_size=56,
                 aux_mod_size=26,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.COMPOSITESCALINGAUTO)
    cc = GenCryptoContext(p, seed=7)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE | PKESchemeFeature.ADVANCEDSHE
              | PKESchemeFeature.FHE)
    cc.EvalBootstrapSetup(level_budget=budget, slots=slots)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalBootstrapKeyGen(kp.secret_key, slots)
    rng = np.random.default_rng(0)
    z = rng.uniform(-0.5, 0.5, size=slots)
    pt = cc.MakeCKKSPackedPlaintext(z, slots=slots)
    ct = cc.Encrypt(kp.public_key, pt)
    ct = cc.LevelReduce(ct, depth - 2)
    out = cc.EvalBootstrap(ct)
    dec = cc.Decrypt(kp.secret_key, out)
    err = float(np.max(np.abs(np.asarray(dec.values[:slots]).real - z)))
    prec = -np.log2(err) if err > 0 else 40.0
    print(f"N={n:5d} slots={slots:5d} budget={budget} "
          f"prec={prec:5.1f} bits err={err:.3e}", flush=True)
    return prec


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "grid"
    if which == "grid":
        for n, slots in ((512, 64), (512, 256), (1024, 64), (1024, 512),
                         (2048, 128), (2048, 1024)):
            run(n, slots)
    elif which == "one":
        run(int(sys.argv[2]), int(sys.argv[3]))
