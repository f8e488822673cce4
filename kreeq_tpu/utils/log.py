"""Verbose logging + per-phase timing (reference: gfalibs Log `lg`
with --verbose, src/main.cpp:36-37; the reference has no profiler —
SURVEY.md §5.1 — so phase timers are first-class here)."""

from __future__ import annotations

import sys
import time
from contextlib import contextmanager

verbose_flag = False
profile_flag = False
_start = time.perf_counter()
_phases: list = []


def set_flags(verbose: bool = False, profile: bool = False) -> None:
    global verbose_flag, profile_flag
    verbose_flag = verbose
    profile_flag = profile


def verbose(msg: str) -> None:
    if verbose_flag:
        elapsed = time.perf_counter() - _start
        sys.stderr.write(f"[{elapsed:8.2f}s] {msg}\n")


@contextmanager
def phase(name: str):
    """Time a pipeline phase; report with print_profile()."""
    t0 = time.perf_counter()
    verbose(f"{name}...")
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _phases.append((name, dt))
        verbose(f"{name} done in {dt:.3f}s")


def print_profile() -> None:
    if profile_flag and _phases:
        sys.stderr.write("=== phase profile ===\n")
        for name, dt in _phases:
            sys.stderr.write(f"{name:<30s} {dt * 1e3:10.1f} ms\n")


def maybe_start_jax_profiler(trace_dir: str) -> None:
    """Capture a jax.profiler trace for the run when requested."""
    import jax

    jax.profiler.start_trace(trace_dir)


def maybe_stop_jax_profiler() -> None:
    import jax

    jax.profiler.stop_trace()
