"""Profiling hooks (SURVEY.md section 5: the reference only has elapsed-time
verbose logging; here we add JAX profiler traces behind an env var).

Set GFALIGN_TPU_TRACE=<dir> to capture a profiler trace of the mode
execution, viewable with TensorBoard / xprof.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def maybe_trace():
    trace_dir = os.environ.get("GFALIGN_TPU_TRACE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
