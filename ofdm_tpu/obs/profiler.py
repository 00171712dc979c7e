"""Profiler hooks: jax.profiler traces around pipeline sections.

The TPU equivalent of the reference's ad-hoc Instant timing
(src/signals/mod.rs:502-508) and fern debug spans: wrap any section in
``trace("name")`` to capture a TensorBoard-compatible trace, or use
``timed`` for wall-clock spans logged through the standard logger.
"""

from __future__ import annotations

import contextlib
import logging
import time

log = logging.getLogger("ofdm_tpu.profiler")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ofdm_tpu_trace"):
    """Capture a jax profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str):
    """Wall-clock span logged at DEBUG (blocks on async device work)."""
    import jax

    t0 = time.perf_counter()
    try:
        yield
    finally:
        try:
            jax.effects_barrier()
        except Exception:
            pass
        log.debug("%s: %.3f ms", name, (time.perf_counter() - t0) * 1e3)


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
