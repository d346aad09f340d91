"""Profiling hooks (SURVEY §5.1: the reference has none beyond wall-clock
timing; here jax.profiler traces are first-class)."""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str], enabled: bool = True
                ) -> Iterator[None]:
    """Wrap a region in a jax.profiler trace when a directory is set."""
    if profile_dir and enabled:
        os.makedirs(profile_dir, exist_ok=True)
        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield


def step_annotation(name: str, step: int):
    """Per-step trace annotation (shows up as named regions in xprof)."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step)
