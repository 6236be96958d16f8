"""North-star benchmark: CKKS EvalMult + relinearize throughput.

Target metric (BASELINE.json): ciphertexts/s at N=2^16, L=30 (31 towers of
<=28/30 bits on 32-bit TPU lanes), hybrid key switching with 3 digits —
vs. OpenFHE NATIVE_SIZE=64 on a 64-core CPU (estimated ~50 ct/s: OpenFHE
lib-benchmark EvalMult+relin at N=2^16 with a 30-level chain runs ~20ms
multithreaded on a modern 64-core Epyc; no published number exists, see
BASELINE.md).

Prints exactly one JSON line.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: first run pays ~6 min of XLA compiles,
# subsequent runs start hot
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_CT_PER_S = 50.0   # documented estimate, see BASELINE.md


def main():
    import numpy as np
    from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                           Scheme, SecurityLevel)
    from openfhe_tpu.pke.context import GenCryptoContext
    from openfhe_tpu.pke.parameters import CCParams
    from openfhe_tpu.pke.keyswitch import hybrid
    from openfhe_tpu.math import modops as mo

    n = 1 << 16
    depth = 30
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=n, mult_depth=depth,
                 scaling_mod_size=28, first_mod_size=30,
                 security_level=SecurityLevel.HEStd_128_classic,
                 scaling_technique=ScalingTechnique.FIXEDMANUAL)
    cc = GenCryptoContext(p, seed=7)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)

    rng = np.random.default_rng(0)
    z = rng.normal(size=cc.slots)
    pt = cc.MakeCKKSPackedPlaintext(z)
    ct_a = cc.Encrypt(kp.public_key, pt)
    ct_b = cc.Encrypt(kp.public_key, pt)

    tabs = cc.hybrid_tables(cc.size_ql(0))
    ek = cc.eval_mult_keys[kp.secret_key.key_tag]
    basis = tabs.basis_ql

    def mult_relin(carry, _):
        a0, a1 = carry
        b0, b1 = ct_b.elements
        mm = lambda x, y: mo.mul_mod(x, y, basis.q, basis.r32, basis.r32_sh,
                                     basis.m32)
        c0 = mm(a0, b0)
        c1 = mo.add_mod(mm(a0, b1), mm(a1, b0), basis.q)
        c2 = mm(a1, b1)
        d0, d1 = hybrid.keyswitch_core(c2, ek, tabs)
        return (mo.add_mod(c0, d0, basis.q), mo.add_mod(c1, d1, basis.q)), 0

    iters = 10

    @jax.jit
    def chain(a0, a1):
        (o0, o1), _ = jax.lax.scan(mult_relin, (a0, a1), None, length=iters)
        return o0, o1

    a0, a1 = ct_a.elements
    out = chain(a0, a1)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = chain(a0, a1)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ct_per_s = (iters * reps) / dt

    print(json.dumps({
        "metric": "ckks_evalmult_relin_ct_per_s_N65536_L30",
        "value": round(ct_per_s, 3),
        "unit": "ciphertexts/s",
        "vs_baseline": round(ct_per_s / BASELINE_CT_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
