"""Cross-chip staged NTT: the 4-step transform sharded over a mesh axis.

SURVEY.md §2.5/§7.11 ("staged cross-chip NTT"): at very large rings the
transform itself no longer fits one chip's arithmetic budget, so the
Bailey 4-step factorization is distributed the way distributed FFTs are —
each matmul stage is LOCAL, and the stage boundary is one `all_to_all`
transpose riding ICI:

    X [k, R, C]   sharded over C (columns)
      stage 1:  S1 = WR @ X        -- contracts over R: column-local
      twiddle:  S1 * TW            -- elementwise, twiddle arrives sharded
      all_to_all: C-sharded -> R-sharded (the distributed transpose)
      stage 2:  Y^T = WC @ S2^T    -- contracts over C: row-local
      all_to_all: back to minor-dim sharding so in/out specs match

Reference analog: the OpenMP tower loops of transformnat-impl.h have no
cross-node story at all; this is the TPU-native scale-out design. Tables
come from ops/ntt4step (bit-reversals folded in), so results are
bit-exact vs ops/ntt.py on any mesh size that divides R and C.

Validated on the virtual 8-device CPU mesh (tests/test_parallel.py);
matmuls dispatch to the int8 MXU kernel on real TPUs via ops/modmatmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from openfhe_tpu.lattice.basis import Basis
from openfhe_tpu.math import modops as mo
from openfhe_tpu.ops import modmatmul as mmx
from openfhe_tpu.ops import ntt4step


def _tables(b: Basis):
    return ntt4step._dev_tables(b.moduli, b.ring_dim)


def _fwd_local(xx, wr, wc, tw, tw_sh, consts, axis):
    """Per-device body: xx [k, R, Cloc] uint32."""
    k, r, cloc = xx.shape
    s1 = mmx.mod_matmul(wr, xx, consts)                     # [k, R, Cloc]
    q3 = consts["q"][:, None, None]
    s2 = mo.mul_mod_shoup(s1, tw, tw_sh, q3)                # twiddle shard
    # distributed transpose: C-sharded -> R-sharded
    s2 = jax.lax.all_to_all(s2, axis, split_axis=1, concat_axis=2,
                            tiled=True)                     # [k, Rloc, C]
    y = mmx.mod_matmul(wc, jnp.swapaxes(s2, 1, 2), consts)  # [k, C, Rloc]
    y = jnp.swapaxes(y, 1, 2)                               # [k, Rloc, C]
    # return to minor-dim sharding so input/output specs match
    return jax.lax.all_to_all(y, axis, split_axis=2, concat_axis=1,
                              tiled=True)                   # [k, R, Cloc]


def _inv_local(yy, wci, wri, twi, twi_sh, consts, axis):
    k, r, cloc = yy.shape
    # stage A contracts over the cc' axis: need rows local, columns full
    y = jax.lax.all_to_all(yy, axis, split_axis=1, concat_axis=2,
                           tiled=True)                      # [k, Rloc, C]
    s2 = mmx.mod_matmul(wci, jnp.swapaxes(y, 1, 2), consts)  # [k, C, Rloc]
    s2 = jnp.swapaxes(s2, 1, 2)                             # [k, Rloc, C]
    s2 = jax.lax.all_to_all(s2, axis, split_axis=2, concat_axis=1,
                            tiled=True)                     # [k, R, Cloc]
    q3 = consts["q"][:, None, None]
    s1 = mo.mul_mod_shoup(s2, twi, twi_sh, q3)
    return mmx.mod_matmul(wri, s1, consts)                  # [k, R, Cloc]


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "inverse"))
def _ntt_sharded(x_krc, tabs_w0, tabs_w1, tw, tw_sh, consts, mesh: Mesh,
                 axis: str, inverse: bool):
    spec_x = P(None, None, axis)
    spec_w = P()
    spec_tw = P(None, None, axis)
    spec_c = P()
    fn = _inv_local if inverse else _fwd_local
    return shard_map(
        lambda xx, w0, w1, t, tsh, cst: fn(xx, w0, w1, t, tsh, cst, axis),
        mesh=mesh,
        in_specs=(spec_x, spec_w, spec_w, spec_tw, spec_tw, spec_c),
        out_specs=spec_x,
        check_rep=False,
    )(x_krc, tabs_w0, tabs_w1, tw, tw_sh, consts)


def _apply(x: jnp.ndarray, b: Basis, mesh: Mesh, axis: str, inverse: bool):
    tabs = _tables(b)
    r, c = tabs["r"], tabs["c"]
    d = mesh.shape[axis]
    if r % d or c % d:
        raise ValueError(f"mesh axis size {d} must divide R={r} and C={c}")
    k = x.shape[-2]
    lead = x.shape[:-2]
    if lead != ():
        raise ValueError("sharded NTT takes one [k, N] element at a time")
    if inverse:
        # input EVAL bitrev: index j = d*C + cc -> [k, R, C] rows=d
        xx = x.reshape(k, r, c)
        out = _ntt_sharded(xx, tabs["wci"], tabs["wri"], tabs["twi"],
                           tabs["twi_sh"], tabs["consts"], mesh, axis, True)
        return out.reshape(k, r * c)
    xx = x.reshape(k, r, c)
    out = _ntt_sharded(xx, tabs["wr"], tabs["wc"], tabs["tw"],
                       tabs["tw_sh"], tabs["consts"], mesh, axis, False)
    return out.reshape(k, r * c)


def ntt_fwd_sharded(x: jnp.ndarray, b: Basis, mesh: Mesh,
                    axis: str = "limb") -> jnp.ndarray:
    """COEFF -> EVAL (bitrev), sharded over `axis`; bit-exact vs
    ops.ntt.ntt_fwd. x: uint32 [k, N]."""
    return _apply(x, b, mesh, axis, inverse=False)


def ntt_inv_sharded(y: jnp.ndarray, b: Basis, mesh: Mesh,
                    axis: str = "limb") -> jnp.ndarray:
    """EVAL (bitrev) -> COEFF, sharded over `axis`."""
    return _apply(y, b, mesh, axis, inverse=True)
