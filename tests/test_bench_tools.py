"""Guard logic of the perf tooling (scripts/kernel_tune.py regression
checker, scripts/bench_geometries.py trace accounting).

These pin the round-3 review fixes: a thresholded kernel config that fails
to compile must FAIL --assert-regression (absence from the sweep results is
the only signal), and device_total_ms must reject traces whose op sum
disagrees with the XLA Modules envelope (double-counted containing events /
dropped events) instead of recording a wrong number.
"""

import gzip
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --- kernel_tune.check_regressions -------------------------------------------

def _label(shape, g, mode):
    # the sweep's label format: f"{shape} g={g:3d} f=auto {mode:6s} drop=0.1"
    return f"{shape} g={g:3d} f=auto {mode:6s} drop=0.1"


def test_assert_regression_all_within_bounds():
    kt = _load("kernel_tune")
    results = [
        (_label("spatial", 16, "fwd"), 1.06, None),
        (_label("spatial", 16, "fwdbwd"), 3.18, None),
        (_label("spectral", 32, "fwd"), 1.17, None),
        (_label("spectral", 32, "fwdbwd"), 3.80, None),
    ]
    failures, missing = kt.check_regressions(results)
    assert failures == [] and missing == []


def test_assert_regression_trips_on_slow_config():
    kt = _load("kernel_tune")
    results = [
        (_label("spatial", 16, "fwd"), 1.06, None),
        (_label("spatial", 16, "fwdbwd"), 3.18, None),
        (_label("spectral", 32, "fwd"), 1.17, None),
        (_label("spectral", 32, "fwdbwd"), 9.99, None),  # regression
    ]
    failures, missing = kt.check_regressions(results)
    assert missing == []
    assert failures == [(("spectral", 32, "fwdbwd"), 9.99, 4.11)]


def test_assert_regression_fails_on_missing_config():
    """A config that errored (VMEM OOM, failed trace) is skipped from the
    sweep's results — the checker must surface it, not exit 0 (the original
    implementation passed whenever checked > 0)."""
    kt = _load("kernel_tune")
    results = [
        (_label("spatial", 16, "fwd"), 1.06, None),
        (_label("spatial", 16, "fwdbwd"), 3.18, None),
        (_label("spectral", 32, "fwd"), 1.17, None),
        # spectral fwdbwd absent: compile failure
    ]
    failures, missing = kt.check_regressions(results)
    assert failures == []
    assert missing == [("spectral", 32, "fwdbwd")]


def test_assert_regression_ignores_untracked_configs():
    kt = _load("kernel_tune")
    results = [
        (_label("spatial", 16, "fwd"), 1.06, None),
        (_label("spatial", 64, "fwd"), 99.0, None),  # no threshold for g=64
    ]
    failures, missing = kt.check_regressions(
        results, limits={("spatial", 16, "fwd"): 1.15}
    )
    assert failures == [] and missing == []


# --- bench_geometries.device_total_ms ----------------------------------------

def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "t.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _device_meta(pid=7):
    return {
        "ph": "M",
        "pid": pid,
        "name": "process_name",
        "args": {"name": "/device:TPU:0"},
    }


def _op(pid, name, dur_us, cat="fusion", extra_args=None):
    args = {"hlo_category": cat} if cat is not None else {}
    if extra_args:
        args.update(extra_args)
    return {"ph": "X", "pid": pid, "name": name, "dur": dur_us, "args": args}


def test_device_total_ms_consistent_trace(tmp_path):
    bg = _load("bench_geometries")
    events = [
        _device_meta(),
        # module envelope: 1000 us
        _op(7, "jit_superstep", 1000.0, cat=None, extra_args={"run_id": 1}),
        # ops summing to 980 us (within [0.9, 1.02] of the envelope)
        _op(7, "fusion.1", 500.0),
        _op(7, "fusion.2", 480.0),
        # a `while` envelope containing them must NOT be counted
        _op(7, "while", 990.0, cat="while"),
    ]
    logdir = _write_trace(tmp_path, events)
    assert abs(bg.device_total_ms(logdir) - 0.98) < 1e-9


def test_device_total_ms_rejects_double_count(tmp_path, capsys):
    """An uncaught containing-event kind (op sum >> modules envelope) must
    yield NaN, not a silently wrong figure — the round-3 Houston leg bug
    class (device > wall)."""
    bg = _load("bench_geometries")
    events = [
        _device_meta(),
        _op(7, "jit_superstep", 1000.0, cat=None, extra_args={"run_id": 1}),
        _op(7, "fusion.1", 900.0),
        _op(7, "some-new-envelope", 950.0, cat="grouping"),  # double-count
    ]
    logdir = _write_trace(tmp_path, events)
    out = bg.device_total_ms(logdir)
    assert out != out  # NaN
    assert "trace inconsistent" in capsys.readouterr().err


def test_device_total_ms_rejects_dropped_events(tmp_path):
    """Perfetto exports can silently drop op events on short traces
    (CLAUDE.md): op sum << envelope must also be rejected."""
    bg = _load("bench_geometries")
    events = [
        _device_meta(),
        _op(7, "jit_superstep", 1000.0, cat=None, extra_args={"run_id": 1}),
        _op(7, "fusion.1", 300.0),  # 0.3 of the envelope
    ]
    logdir = _write_trace(tmp_path, events)
    out = bg.device_total_ms(logdir)
    assert out != out  # NaN


def test_device_total_ms_no_trace(tmp_path):
    bg = _load("bench_geometries")
    out = bg.device_total_ms(str(tmp_path))
    assert out != out  # NaN, not an exception
