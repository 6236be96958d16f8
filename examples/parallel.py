"""Parallelism demo: device-mesh sharding in place of OpenMP.

Port of the reference core example (src/core/examples/parallel.cpp:67-182),
re-designed TPU-first. The reference demonstrates `#pragma omp parallel for`
over an array fill plus the OpenFHEParallelControls thread knobs; the TPU
analog is data parallelism over a `jax.sharding.Mesh` — one jitted program,
XLA partitions the work across every device, no thread management.

Run on a multi-device host (or force a virtual CPU mesh with
XLA_FLAGS=--xla_force_host_platform_device_count=8) to see >1 devices.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import time

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openfhe_tpu.utils.profiling import TIC, TOC_MS


def verify(foo: np.ndarray) -> None:
    if np.all(np.diff(foo) == 1):
        print("verification succeeded")
    else:
        print("verification failed")


def main(array_size: int = 1 << 20):
    devs = jax.devices()
    print(f"Parallel computation demo using {len(devs)} device(s): "
          f"{devs[0].platform}")
    print("to change the virtual device count on CPU, export "
          "XLA_FLAGS=--xla_force_host_platform_device_count=<n>\n")

    # pad to a multiple of the device count (static shapes; XLA requires
    # even sharding along the data axis)
    n_dev = len(devs)
    padded = (array_size + n_dev - 1) // n_dev * n_dev
    mesh = Mesh(np.asarray(devs), ("data",))
    shard = NamedSharding(mesh, P("data"))

    # the reference fills foo[i] = i under `#pragma omp parallel for`;
    # here the iota is sharded across the mesh and each device writes its
    # own slice — the "loop body" (a square-root-of-square, to give the
    # VPU something to chew on) runs devicewise in parallel
    @jax.jit
    def fill(x):
        return jnp.sqrt(x.astype(jnp.float32) ** 2)

    seed = jax.device_put(jnp.arange(padded, dtype=jnp.int32), shard)
    fill(seed).block_until_ready()          # compile outside the timer

    t = TIC()
    out = fill(seed)
    out.block_until_ready()
    print(f"Total time (sharded over {n_dev} device(s)): "
          f"{TOC_MS(t):.3f} ms")
    verify(np.asarray(out)[:array_size])

    # single-device comparison run (the reference's serial baseline)
    single = jax.device_put(jnp.arange(padded, dtype=jnp.int32), devs[0])
    fill(single).block_until_ready()
    t = TIC()
    out1 = fill(single)
    out1.block_until_ready()
    print(f"Total time (single device):            {TOC_MS(t):.3f} ms")
    verify(np.asarray(out1)[:array_size])

    # host-side timing helper demo (reference TIC/TOC + PROFILELOG)
    t = TIC()
    time.sleep(0.01)
    print(f"\nPROFILELOG demo — 10 ms host sleep measured as "
          f"{TOC_MS(t):.1f} ms")


if __name__ == "__main__":
    import sys
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20)
