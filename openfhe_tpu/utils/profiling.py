"""Stage timers and device profiling hooks.

Reference analog: /root/reference src/core/include/utils/debug.h:91-127
(TIC/TOC/PROFILELOG macros) and the BOOTSTRAPTIMING stage prints in
ckksrns-fhe.cpp. On TPU, wall-clock timing must block on device work, and
deep traces come from jax.profiler (view in TensorBoard/XProf).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

PROFILE = bool(int(os.environ.get("OPENFHE_TPU_PROFILE", "0")))


def TIC() -> float:
    return time.perf_counter()


def TOC(t0: float, result=None) -> float:
    """Elapsed seconds since t0, blocking on `result` if given."""
    if result is not None:
        jax.block_until_ready(result)
    return time.perf_counter() - t0


def TOC_MS(t0: float, result=None) -> float:
    """Elapsed milliseconds (reference TOC_MS, utils/debug.h)."""
    return TOC(t0, result) * 1e3


def TOC_US(t0: float, result=None) -> float:
    """Elapsed microseconds (reference TOC_US, utils/debug.h)."""
    return TOC(t0, result) * 1e6


def profile_log(stage: str, seconds: float) -> None:
    if PROFILE:
        print(f"[openfhe-tpu] {stage}: {seconds * 1e3:.2f} ms", flush=True)


@contextlib.contextmanager
def stage(name: str):
    """`with stage("CoeffsToSlots"): ...` — prints under
    OPENFHE_TPU_PROFILE=1, free otherwise."""
    t0 = time.perf_counter()
    yield
    if PROFILE:
        profile_log(name, time.perf_counter() - t0)


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/openfhe_tpu_trace"):
    """jax.profiler trace for kernel-level inspection."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
