"""Capture a device trace of the fused mult+relin chain (one dispatch of a
30-iteration scan) for per-kernel attribution. Writes /tmp/ks_trace."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openfhe_tpu.pke.constants import (PKESchemeFeature, ScalingTechnique,
                                       Scheme, SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.pke.keyswitch import ks_fused as kf

n = 1 << 16
p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=n, mult_depth=30,
             scaling_mod_size=26, first_mod_size=27, aux_mod_size=27,
             security_level=SecurityLevel.HEStd_128_classic,
             scaling_technique=ScalingTechnique.FIXEDMANUAL)
cc = GenCryptoContext(p, seed=7)
cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
          | PKESchemeFeature.LEVELEDSHE)
kp = cc.KeyGen()
cc.EvalMultKeyGen(kp.secret_key)
tabs = cc.hybrid_tables(cc.size_ql(0)).fused
ek = cc.eval_mult_keys[kp.secret_key.key_tag]
kql = tabs.kql

rng = np.random.default_rng(0)
mk = lambda *s: jnp.asarray(rng.integers(0, 1 << 26, size=s)
                            .astype(np.uint32))
a0, a1 = mk(kql, n), mk(kql, n)


@jax.jit
def chain(x0, x1):
    def body(cv, _):
        o0, o1 = kf.mult_relin_fused(cv[0], cv[1], cv[0], cv[1],
                                     ek.bv, ek.av, ek.bv_sh, ek.av_sh, tabs)
        m = jnp.uint32((1 << 26) - 1)
        return (o0 & m, o1 & m), 0
    out, _ = jax.lax.scan(body, (x0, x1), None, length=30)
    return out

o = chain(a0, a1)
jax.block_until_ready(o)

with jax.profiler.trace("/tmp/ks_trace"):
    o = chain(a0, a1)
    jax.block_until_ready(o)
print("trace done", flush=True)
