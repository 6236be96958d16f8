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


def probe_s2c(n, slots, depth=20):
    """Numpy-oracle the S2C tail: decrypt ctxt_mod, apply the ideal S2C in
    numpy, and compare both against the homomorphic S2C output."""
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

    # run the pipeline up to ctxt_mod + boost1 (copy of eval_bootstrap)
    n_levels = len(cc.scf_real)
    if ct.noise_deg > 1:
        ct = cc.ModReduce(ct)
    l_pen = n_levels - 2
    ct1 = cc._scalar_mult_raw(ct, math.pow(2.0, -pr.correction),
                              cc.scf_real[l_pen] ** 2 / ct.scale)
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
    ctxt_enc = fftt.eval_fft_stages(cc, raised, pr.c2s_stages, pr.pt_slots)
    conj = cc.EvalConjugate(ctxt_enc)
    if pr.sparse:
        parts = [cc.ModReduce(cc.EvalAdd(ctxt_enc, conj))]
    else:
        enc_i = cb.mult_by_monomial(cc, cc.EvalSub(ctxt_enc, conj),
                                    3 * slots)
        parts = [cc.ModReduce(cc.EvalAdd(ctxt_enc, conj)),
                 cc.ModReduce(enc_i)]
    outs = []
    for part in parts:
        yv = cc.EvalChebyshevSeries(part, pr.cheb_coeffs, -1.0, 1.0)
        if yv.noise_deg > 1:
            yv = cc.ModReduce(yv)
        outs.append(cb.apply_double_angle(cc, yv, pr.r_iters))
    if pr.sparse:
        ctxt_mod = outs[0]
    else:
        ctxt_mod = cc.EvalAdd(outs[0], cb.mult_by_monomial(cc, outs[1],
                                                           slots))
    if pr.boost1 > 1:
        ctxt_mod = cb.mult_by_integer(cc, ctxt_mod, pr.boost1)

    v_mod = np.asarray(cc.Decrypt(sk, ctxt_mod).values)[:pr.pt_slots
                                                        if pr.sparse
                                                        else slots]
    # ideal S2C: slots hold v; coefficients-to-? For full packing,
    # out_k = sum_j U0[k, j] * v_j * dec_scale
    m = 4 * slots
    omega = np.exp(2j * np.pi / m)
    rot_group = np.array([pow(5, i, m) for i in range(slots)])
    u0 = omega ** (np.outer(rot_group, np.arange(slots)) % m)
    # recover dec_scale the way setup computed it
    d = getattr(cc, "comp_deg", 1)
    q0 = 1
    for q in cc.moduli_q[:d]:
        q0 *= q
    sigma1 = cc.scf_real[n_levels - 1]
    v_factor = math.pow(2.0, -pr.correction) * sigma1 / float(q0) \
        * pr.boost1 * pr.boost2
    dec_scale = 1.0 / v_factor
    ideal = (u0 @ v_mod) * dec_scale / pr.boost2 / pr.boost1
    # boost1 was applied to the ciphertext already; boost2 applied after
    # S2C homomorphically -> fold both out of the oracle comparison:
    # ideal_out should equal z
    print(f"  numpy-S2C(dec(ctxt_mod)) vs z: "
          f"err={np.abs(ideal.real[:slots] - z).max():.3e}", flush=True)

    ctxt_dec = fftt.eval_fft_stages(cc, ctxt_mod, pr.s2c_stages,
                                    pr.pt_slots)
    ctxt_dec = cc.ModReduce(ctxt_dec)
    if pr.sparse:
        ctxt_dec = cc.EvalAdd(ctxt_dec, cc.EvalRotate(ctxt_dec, slots))
    if pr.boost2 > 1:
        ctxt_dec = cb.mult_by_integer(cc, ctxt_dec, pr.boost2)
    got = np.asarray(cc.Decrypt(sk, ctxt_dec.replace(slots=slots)
                                ).values).real[:slots]
    print(f"  homomorphic S2C out vs z:      "
          f"err={np.abs(got - z).max():.3e}", flush=True)
    print(f"  homomorphic vs numpy-S2C:      "
          f"err={np.abs(got - ideal.real[:slots]).max():.3e}", flush=True)
