"""Structured metrics + profiling hooks (SURVEY.md §5 'Tracing/profiling',
'Metrics/logging/observability').

Reference parity: the OpenCL reference's only observability is an FPS
counter in the window title (SURVEY.md §5); here every long-running loop
(fit, bench, animate) can emit one JSON line per step to a JSONL file —
host-0 only under multi-host SPMD — and any jitted region can be wrapped in
a jax.profiler trace (XProf/Perfetto) via `profile_trace`.
"""
from __future__ import annotations

import contextlib
import json
import os
import time

import jax


def is_host0() -> bool:
    return jax.process_index() == 0


class MetricsLogger:
    """Append-only JSONL metrics writer; silent no-op off host 0.

    append=True keeps the existing file (resumed runs must not erase the
    earlier steps' history); the default truncates for one-file-per-run."""

    def __init__(self, path: str | None, host0_only: bool = True,
                 append: bool = False):
        self._path = path
        self._enabled = bool(path) and (not host0_only or is_host0())
        self._t0 = time.time()
        if self._enabled:
            d = os.path.dirname(os.path.abspath(path))
            os.makedirs(d, exist_ok=True)
            if not append:
                # Truncate: one file per run.
                with open(path, "w"):
                    pass

    def log(self, **fields) -> None:
        if not self._enabled:
            return
        rec = {"t": round(time.time() - self._t0, 4), **fields}
        with open(self._path, "a") as f:
            f.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def profile_trace(enabled: bool, trace_dir: str | None = None):
    """jax.profiler.trace wrapper keyed on RenderConfig.profile.

    Writes an XProf trace (viewable in TensorBoard/Perfetto) to `trace_dir`
    (default $TRACER_PROFILE_DIR or /tmp/tracer_profile) when enabled.
    """
    if not enabled:
        yield None
        return
    d = trace_dir or os.environ.get("TRACER_PROFILE_DIR", "/tmp/tracer_profile")
    os.makedirs(d, exist_ok=True)
    with jax.profiler.trace(d):
        yield d
    print(f"[profile] jax.profiler trace written to {d}", flush=True)
