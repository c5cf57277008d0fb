"""Tracing / profiling helpers (SURVEY.md §5: the reference has wall-clock
timers only — utils.py:27-78, 500-510; the TPU build adds XLA traces).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-viewable trace (xplane) under the run's log dir.
- :func:`annotate` — named region inside a trace (TraceAnnotation).
- :func:`show_resource` — host memory snapshot (role of reference
  utils.py:724-728, which shelled nvidia-smi/free).
"""
from __future__ import annotations

import contextlib
import logging
import os


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture an XLA profiler trace into ``{log_dir}/plugins/profile``."""
    if not enabled:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    try:
        # start can fail too (e.g. profiler service unavailable on the
        # tunnel transport) — degrade to a no-op instead of aborting the run
        try:
            jax.profiler.start_trace(log_dir)
        except Exception as e:
            import logging
            logging.warning("profiler start_trace failed (%s); tracing "
                            "skipped", e)
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception as e:  # tunnel transports may not support tracing
            logging.warning("profiler stop failed: %s", e)


def annotate(name: str):
    """Named region for traces: ``with annotate("spmm"): ...``"""
    import jax
    return jax.profiler.TraceAnnotation(name)


def show_resource() -> dict:
    """Host memory/cpu snapshot, logged and returned."""
    out = {}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith(("MemTotal", "MemAvailable")):
                    k, v = line.split(":")
                    out[k] = v.strip()
        with open("/proc/loadavg") as f:
            out["loadavg"] = f.read().split()[0]
    except OSError:
        pass
    logging.info("resources: %s", out)
    return out
