"""Device-side distribution generators (jax.random / threefry).

TPU-native replacement for the reference's distribution generators
(/root/reference src/core/include/math/discretegaussiangenerator.h,
ternaryuniformgenerator.h, discreteuniformgenerator.h) and the BLAKE2
counter-mode PRNG (prng/blake2engine.h). Library randomness rides JAX's
threefry; tests use round-trip / statistical oracles, never RNG-stream
equality (the reference's own tests work the same way, SURVEY.md §4).

Small signed samples (secrets, errors) are drawn once as int32 `[..., N]`
and lifted to RNS residues across all towers — the TPU analog of sampling a
single integer polynomial and reducing per modulus.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openfhe_tpu.lattice.basis import Basis

DEFAULT_SIGMA = 3.19  # reference default (distributiongenerator defaults)


def ternary(key, shape, hamming_weight: int | None = None) -> jnp.ndarray:
    """Uniform ternary {-1, 0, 1} int32 sample (secret keys).

    With `hamming_weight` h, samples a sparse ternary vector of exactly h
    nonzeros (reference: TernaryUniformGeneratorImpl sparse mode).
    """
    if hamming_weight is None:
        return jax.random.randint(key, shape, -1, 2, dtype=jnp.int32)
    n = shape[-1]
    k1, k2 = jax.random.split(key)
    # random signs at h random positions via permutation
    perm = jax.random.permutation(k1, n)
    signs = jax.random.choice(k2, jnp.array([-1, 1], jnp.int32), (n,))
    vals = jnp.where(jnp.arange(n) < hamming_weight, signs, 0)
    out = jnp.zeros(n, jnp.int32).at[perm].set(vals)
    return jnp.broadcast_to(out, shape)


def discrete_gaussian(key, shape, sigma: float = DEFAULT_SIGMA) -> jnp.ndarray:
    """Rounded-Gaussian int32 sample, clipped to ±6 sigma (errors).

    Statistically close to the reference's Peikert-inversion sampler for the
    small sigma used by RLWE error distributions.
    """
    x = jax.random.normal(key, shape) * sigma
    bound = jnp.ceil(6.0 * sigma)
    return jnp.clip(jnp.round(x), -bound, bound).astype(jnp.int32)


def uniform_residues(key, basis: Basis, lead_shape=()) -> jnp.ndarray:
    """Uniform element of R_Q as independent uniform residues per tower."""
    k = len(basis.moduli)
    n = basis.ring_dim
    # rejection-free: randint per tower with its own modulus
    keys = jax.random.split(key, k)
    cols = [jax.random.randint(keys[i], lead_shape + (1, n), 0,
                               int(basis.moduli[i]), dtype=jnp.uint32)
            for i in range(k)]
    return jnp.concatenate(cols, axis=-2)


def to_residues(small: jnp.ndarray, basis: Basis) -> jnp.ndarray:
    """Lift signed int32 [..., N] (|v| << q) to [..., k, N] residues."""
    v = small[..., None, :]
    q = basis.q.astype(jnp.int32)
    r = v % q  # jnp int mod: result has sign of divisor (python semantics) -> [0, q)
    return r.astype(jnp.uint32)
