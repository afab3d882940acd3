"""utils/profiling.py coverage: the watchdog-guarded tracer and StepTimer.

The reference has no profiling subsystem (SURVEY.md §5.1); these helpers are
new TPU-side tooling, so the tests only pin our own contract: trace() always
yields a dict with wall_s and never raises even when the backend cannot
profile, and StepTimer aggregates correctly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from maskedsst_tpu.utils.profiling import StepTimer, trace


def test_trace_yields_wall_time(tmp_path):
    with trace(logdir=str(tmp_path / "tr")) as info:
        x = jnp.ones((8, 8))
        float(jnp.sum(x * 2.0))
    assert info["wall_s"] > 0.0
    assert isinstance(info["traced"], bool)
    if info["traced"]:
        assert info["logdir"] == str(tmp_path / "tr")
    else:
        assert info["logdir"] is None


def test_trace_degrades_on_hung_profiler(tmp_path, monkeypatch):
    """A profiler that never returns must not block the traced block."""
    import time

    def _hang(*a, **k):
        time.sleep(30.0)

    monkeypatch.setattr(jax.profiler, "start_trace", _hang)
    with trace(logdir=str(tmp_path / "tr"), timeout_s=0.2) as info:
        pass
    assert info["traced"] is False
    assert info["wall_s"] >= 0.0


def test_step_timer_summary():
    t = StepTimer()
    for _ in range(4):
        t.start()
        y = jnp.arange(16.0) + 1.0
        t.stop(sync_value=y)  # host fetch forces completion
    s = t.summary()
    assert s["n"] == 4
    assert s["mean_ms"] > 0.0
    assert s["p50_ms"] <= s["p95_ms"] * (1 + 1e-9)
    assert StepTimer().summary() == {}


def test_step_timer_sync_fetches_value():
    t = StepTimer()
    t.start()
    dt = t.stop(sync_value=np.zeros((0,)))  # empty arrays must not raise
    assert dt >= 0.0
