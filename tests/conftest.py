"""Test config: run logic tests on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of exercising multi-party / parallel logic
in one process (SURVEY.md §4); multi-chip sharding is validated on host
devices via --xla_force_host_platform_device_count.

Note: the axon environment pre-imports jax via sitecustomize, so env vars
alone are too late — we must switch the platform through jax.config.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-dominated (per-level
# kernel variants); caching makes reruns and CI-style repeat runs fast
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
