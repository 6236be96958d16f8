"""Mesh/sharding utilities — the TPU replacement for OpenMP parallelism.

Reference analog: /root/reference src/core/include/utils/parallel.h
(OpenFHEParallelControls thread budget) and the 183 `#pragma omp parallel
for` loops over RNS towers (SURVEY.md §2.5). On TPU, tower ("limb") and
ciphertext-batch parallelism map onto a jax.sharding.Mesh: the limb axis
shards the `[k, N]` residue tensors (base conversion is the only
cross-limb mixing point, lowered to ICI collectives by XLA), and batches
of ciphertexts/gates shard data-parallel.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ParallelControls:
    """Global mesh configuration (reference: OpenFHEParallelControls).

    Holds the process-wide mesh used by `shard_ciphertext`/`shard_batch`.
    Defaults to all visible devices on a (dp, limb) grid.
    """

    def __init__(self):
        self._mesh = None

    def set_mesh(self, mesh: Mesh) -> None:
        self._mesh = mesh

    def get_mesh(self, limb: int | None = None) -> Mesh:
        if self._mesh is not None:
            return self._mesh
        devs = np.array(jax.devices())
        n = len(devs)
        if limb is None:
            limb = 2 if n % 2 == 0 and n > 1 else 1
        dp = n // limb
        self._mesh = Mesh(devs[:dp * limb].reshape(dp, limb), ("dp", "limb"))
        return self._mesh

    def enable(self) -> bool:
        return len(jax.devices()) > 1


OpenFHEParallelControls = ParallelControls()


def shard_ciphertext(ct, mesh: Mesh | None = None):
    """Shard a ciphertext's [k, N] elements over the mesh's limb axis.

    Falls back to replication when the tower count does not divide evenly
    (mid-chain levels); sharding is most profitable at full chains where
    k is sized to the mesh."""
    mesh = mesh or OpenFHEParallelControls.get_mesh()
    limb = mesh.shape.get("limb", 1)
    k = ct.elements[0].shape[0]
    spec = P("limb", None) if limb > 1 and k % limb == 0 else P()
    sh = NamedSharding(mesh, spec)
    return ct.replace(elements=tuple(jax.device_put(e, sh)
                                     for e in ct.elements))


def shard_batch(x, mesh: Mesh | None = None):
    """Shard a [batch, ...] tensor data-parallel over the dp axis."""
    mesh = mesh or OpenFHEParallelControls.get_mesh()
    spec = P("dp", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh | None = None):
    """Replicate (keys, tables) across the mesh."""
    mesh = mesh or OpenFHEParallelControls.get_mesh()
    return jax.device_put(x, NamedSharding(mesh, P()))
