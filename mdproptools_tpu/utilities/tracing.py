"""
Structured tracing/profiling (SURVEY.md section 5: the reference's
observability is ad-hoc ``print`` + ``time()`` around hot loops,
``rdf_cn.py:189-190,487-499``; here it is a real logger plus optional
on-device profiler traces).

- ``logger``: the package logger (``mdproptools_tpu``); silent by
  default, enable with ``enable_logging(level)``.
- ``stage(name)``: context manager logging wall-clock per pipeline stage
  at DEBUG.
- ``profile_trace(dir)``: context manager wrapping ``jax.profiler`` —
  produces a TensorBoard-compatible device trace of everything inside.
"""

import contextlib
import logging
import time

logger = logging.getLogger("mdproptools_tpu")
logger.addHandler(logging.NullHandler())


def enable_logging(level=logging.INFO):
    """Attach a stderr handler with a compact format."""
    h = logging.StreamHandler()
    h.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    )
    logger.addHandler(h)
    logger.setLevel(level)
    return logger


@contextlib.contextmanager
def stage(name: str, **fields):
    """Log a pipeline stage's wall-clock at DEBUG level."""
    t0 = time.time()
    try:
        yield
    finally:
        extra = "".join(f" {k}={v}" for k, v in fields.items())
        logger.debug("stage %s took %.3fs%s", name, time.time() - t0, extra)


@contextlib.contextmanager
def profile_trace(trace_dir: str):
    """Capture a jax.profiler device trace into ``trace_dir`` (view with
    TensorBoard or xprof)."""
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
