"""Stage-probe the full-slot bootstrap: decrypt the EvalMod input y and
check dist(K*y, Z) (should be ~|m|/q0), plus |y| range and downstream
stages, full vs sparse at the same ring."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import math  # noqa: E402
import sys  # noqa: E402
import numpy as np  # noqa: E402

from openfhe_tpu.pke.constants import (PKESchemeFeature,  # noqa: E402
                                       ScalingTechnique, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext  # noqa: E402
from openfhe_tpu.pke.parameters import CCParams  # noqa: E402
from openfhe_tpu.pke.fhe import ckks_bootstrap as cb  # noqa: E402
from openfhe_tpu.pke.fhe import fft_transform as fftt  # noqa: E402


def probe(n, slots, depth=20):
    p = CCParams(scheme=Scheme.CKKSRNS_SCHEME, ring_dim=n,
                 mult_depth=depth, scaling_mod_size=50, first_mod_size=56,
                 aux_mod_size=26,
                 security_level=SecurityLevel.HEStd_NotSet,
                 scaling_technique=ScalingTechnique.COMPOSITESCALINGAUTO)
    cc = GenCryptoContext(p, seed=7)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE | PKESchemeFeature.ADVANCEDSHE
              | PKESchemeFeature.FHE)
    cc.EvalBootstrapSetup(level_budget=(2, 2), slots=slots)
    kp = cc.KeyGen()
    cc.EvalMultKeyGen(kp.secret_key)
    cc.EvalBootstrapKeyGen(kp.secret_key, slots)
    rng = np.random.default_rng(0)
    z = rng.uniform(-0.5, 0.5, size=slots)
    ct = cc.Encrypt(kp.public_key, cc.MakeCKKSPackedPlaintext(z, slots=slots))
    ct = cc.LevelReduce(ct, depth - 2)

    pr = cc._boot_precom[slots]
    sk = kp.secret_key
    d0 = getattr(cc, "comp_deg", 1)
    q0 = 1
    for q in cc.moduli_q[:d0]:
        q0 *= q

    def dec(c, label):
        d = cc.Decrypt(sk, c)
        v = np.asarray(d.values)
        return v

    # ---- replicate eval_bootstrap with probes ----
    n_levels = len(cc.scf_real)
    if ct.noise_deg > 1:
        ct = cc.ModReduce(ct)
    l_pen = n_levels - 2
    pt_scale = cc.scf_real[l_pen] ** 2 / ct.scale
    ct1 = cc._scalar_mult_raw(ct, math.pow(2.0, -pr.correction), pt_scale)
    if ct1.level < l_pen:
        ct1 = cc.LevelReduce(ct1, l_pen - ct1.level)
    ct1 = cc.ModReduce(ct1)

    raised = cb.mod_raise(cc, ct1)
    raised = cc._scalar_mult_raw(raised, pr.runtime_scalar,
                                 cc.scf_real[0] ** 2 / raised.scale)
    if pr.sparse:
        j = slots
        while j < n // 2:
            raised = cc.EvalAdd(raised, cc.EvalRotate(raised, j))
            j <<= 1
    raised = cc.ModReduce(raised)

    if pr.c2s_stages is not None:
        ctxt_enc = fftt.eval_fft_stages(cc, raised, pr.c2s_stages,
                                        pr.pt_slots)
    else:
        ctxt_enc = cb.eval_linear_transform(cc, raised, pr.c2s_diags,
                                            pr.bstep_enc, pr.pt_slots)
    conj = cc.EvalConjugate(ctxt_enc)
    if pr.sparse:
        enc_r = cc.ModReduce(cc.EvalAdd(ctxt_enc, conj))
        parts = [enc_r]
    else:
        enc_i = cb.mult_by_monomial(cc, cc.EvalSub(ctxt_enc, conj),
                                    3 * slots)
        enc_r = cc.ModReduce(cc.EvalAdd(ctxt_enc, conj))
        enc_i = cc.ModReduce(enc_i)
        parts = [enc_r, enc_i]

    k = pr.k_bound
    for label, part in zip(("y_re", "y_im"), parts):
        y = dec(part, label).real
        ky = k * y
        dist = np.abs(ky - np.round(ky))
        print(f"  {label}: max|y|={np.abs(y).max():.4f} "
              f"dist(K*y,Z): max={dist.max():.4e} "
              f"mean={dist.mean():.4e} frac>0.05: "
              f"{(dist > 0.05).mean():.3f}", flush=True)

    # EvalMod
    outs = []
    for label, part in zip(("mod_re", "mod_im"), parts):
        yv = cc.EvalChebyshevSeries(part, pr.cheb_coeffs, -1.0, 1.0)
        if yv.noise_deg > 1:
            yv = cc.ModReduce(yv)
        yv = cb.apply_double_angle(cc, yv, pr.r_iters)
        outs.append(yv)
        got = dec(yv, label).real
        # expected: m/q0 where m are the plaintext coefficients at raise
        print(f"  {label}: max|out|={np.abs(got).max():.3e}", flush=True)

    if pr.sparse:
        ctxt_mod = outs[0]
    else:
        enc_i2 = cb.mult_by_monomial(cc, outs[1], slots)
        ctxt_mod = cc.EvalAdd(outs[0], enc_i2)
    if pr.boost1 > 1:
        ctxt_mod = cb.mult_by_integer(cc, ctxt_mod, pr.boost1)

    if pr.s2c_stages is not None:
        ctxt_dec = fftt.eval_fft_stages(cc, ctxt_mod, pr.s2c_stages,
                                        pr.pt_slots)
    else:
        ctxt_dec = cb.eval_linear_transform(cc, ctxt_mod, pr.s2c_diags,
                                            pr.bstep_dec, pr.pt_slots)
    ctxt_dec = cc.ModReduce(ctxt_dec)
    if pr.sparse:
        ctxt_dec = cc.EvalAdd(ctxt_dec, cc.EvalRotate(ctxt_dec, slots))
    if pr.boost2 > 1:
        ctxt_dec = cb.mult_by_integer(cc, ctxt_dec, pr.boost2)
    out = ctxt_dec.replace(slots=ct.slots)
    v = dec(out, "final").real[:slots]
    err = np.abs(v - z).max()
    print(f"  final: err={err:.3e} prec={-np.log2(err):.1f} bits",
          flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    print(f"sparse N={n}", flush=True)
    probe(n, 128)
    print(f"full N={n}", flush=True)
    probe(n, n // 2)
