"""utils/profiling.py coverage: the watchdog-guarded tracer.

The reference has no profiling subsystem (SURVEY.md §5.1); these helpers are
new TPU-side tooling, so the tests only pin our own contract: trace() always
yields a dict with wall_s and never raises even when the backend cannot
profile, and traced_busy_ms degrades to None instead of raising.
"""

import jax
import jax.numpy as jnp

from maskedsst_tpu.utils.profiling import trace, traced_busy_ms


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


def test_traced_busy_ms_degrades_to_none(tmp_path, monkeypatch):
    """On backends that cannot trace (or whose traces carry no device pids,
    like CPU), traced_busy_ms returns None rather than raising — its
    consumers (bench.py attribution, zoo device column) are best-effort."""
    import time

    def _hang(*a, **k):
        time.sleep(30.0)

    monkeypatch.setattr(jax.profiler, "start_trace", _hang)
    ran = []
    out = traced_busy_ms(str(tmp_path / "tr"), lambda: ran.append(1), timeout_s=0.2)
    assert out is None
    assert ran == [1]  # the workload still runs, untraced
