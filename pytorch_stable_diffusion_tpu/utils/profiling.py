"""Tracing / profiling — the reference has none (SURVEY §5: the only
instrumentation is a tqdm bar, sd/pipeline.py:205).  TPU-native equivalent:
jax.profiler trace annotations per phase plus a lightweight phase timer.

Usage::

    from pytorch_stable_diffusion_tpu.utils.profiling import phase, timed

    with phase("denoise"):            # shows up in a jax.profiler trace
        latents = run(...)

    with timed() as t:
        images = generate(...)
    print(t.elapsed)

    # whole-program device trace (view with tensorboard/xprof):
    with device_trace("/tmp/sd_trace"):
        generate(...)
"""

from __future__ import annotations

import contextlib
import time


class _Timer:
    elapsed: float = 0.0


@contextlib.contextmanager
def phase(name: str):
    """Named annotation visible in profiler traces (and cheap without one)."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def timed(sync=None):
    """Wall-clock timer; pass an array (or pytree) via ``sync`` to block on
    device completion before stopping the clock."""
    import jax

    t = _Timer()
    start = time.perf_counter()
    try:
        yield t
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        t.elapsed = time.perf_counter() - start


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an xprof/tensorboard device trace for the enclosed block."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
