"""Profiling helpers.

The reference has no profiling at all (SURVEY.md §5.1). ``trace`` wraps
``jax.profiler`` (Perfetto/XProf trace directory) and degrades to wall-clock
timing when the backend does not support tracing (some tunneled TPU plugins
hang the profiler — guarded by a watchdog thread).
"""

from __future__ import annotations

import contextlib
import threading
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str = "/tmp/maskedsst_trace", timeout_s: float = 10.0) -> Iterator[dict]:
    """Context manager: profiles the enclosed block when the backend allows.

    Yields a dict filled on exit with {'wall_s': float, 'traced': bool,
    'logdir': str|None}.
    """
    import jax

    info: dict = {"traced": False, "logdir": None}
    started = threading.Event()
    abandoned = threading.Event()

    def _start():
        try:
            jax.profiler.start_trace(logdir)
            if abandoned.is_set():
                # the watchdog already gave up: stop the late-started session
                # so it doesn't poison every later trace() in this process
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass
                return
            info["traced"] = True
            info["logdir"] = logdir
        except Exception:
            pass
        finally:
            started.set()

    t = threading.Thread(target=_start, daemon=True)
    t.start()
    if not started.wait(timeout_s):  # hung profiler → proceed untraced
        abandoned.set()

    t0 = time.perf_counter()
    try:
        yield info
    finally:
        info["wall_s"] = time.perf_counter() - t0
        if info["traced"]:
            try:
                jax.profiler.stop_trace()
            except Exception:
                info["traced"] = False


class StepTimer:
    """Simple step timer that forces completion via a host fetch (reliable on
    backends where block_until_ready is advisory)."""

    def __init__(self):
        self.times: list = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            import numpy as np

            np.asarray(sync_value).ravel()[:1]
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.times.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        import numpy as np

        arr = np.asarray(self.times)
        return {
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "n": len(arr),
        }
