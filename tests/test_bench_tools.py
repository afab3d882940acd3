"""Guard logic of the perf tooling: the shared trace-accounting policy
(maskedsst_tpu.utils.profiling.parse_device_trace), the kernel_tune
regression gate, and bench_geometries' trace rejection rules.

These pin the round-3 review fixes: a thresholded kernel config that fails
to compile must FAIL --assert-regression (absence from the sweep results is
the only signal); the gate keys on structured (shape, g, mode) tuples (no
label parsing) and refuses non-production sweep overrides; device-time
accounting excludes control-flow envelopes EVERYWHERE (the double-count fix
originally landed in only one of three parser copies) and rejects
over-counted traces while keeping — with a warning — busy time on gap-heavy
modules (the bs-2 finetune leg legitimately idles inside its module span).
"""

import argparse
import gzip
import importlib.util
import json
import os

from maskedsst_tpu.utils.profiling import parse_device_trace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --- kernel_tune.check_regressions -------------------------------------------

def _result(shape, g, mode, ms):
    # the sweep's result rows: (structured key, display label, ms, counts)
    label = f"{shape} g={g:3d} f=auto {mode:6s} drop=0.1"
    return ((shape, g, mode), label, ms, None)


def test_assert_regression_all_within_bounds():
    kt = _load("kernel_tune")
    results = [
        _result("spatial", 16, "fwd", 1.06),
        _result("spatial", 16, "fwdbwd", 3.18),
        _result("spectral", 32, "fwd", 1.17),
        _result("spectral", 32, "fwdbwd", 3.80),
    ]
    failures, missing = kt.check_regressions(results)
    assert failures == [] and missing == []


def test_assert_regression_trips_on_slow_config():
    kt = _load("kernel_tune")
    results = [
        _result("spatial", 16, "fwd", 1.06),
        _result("spatial", 16, "fwdbwd", 3.18),
        _result("spectral", 32, "fwd", 1.17),
        _result("spectral", 32, "fwdbwd", 9.99),  # regression
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
        _result("spatial", 16, "fwd", 1.06),
        _result("spatial", 16, "fwdbwd", 3.18),
        _result("spectral", 32, "fwd", 1.17),
        # spectral fwdbwd absent: compile failure
    ]
    failures, missing = kt.check_regressions(results)
    assert failures == []
    assert missing == [("spectral", 32, "fwdbwd")]


def test_assert_regression_ignores_untracked_configs():
    kt = _load("kernel_tune")
    results = [
        _result("spatial", 16, "fwd", 1.06),
        _result("spatial", 64, "fwd", 99.0),  # no threshold for g=64
    ]
    failures, missing = kt.check_regressions(
        results, limits={("spatial", 16, "fwd"): 1.15}
    )
    assert failures == [] and missing == []


def _sweep_args(**overrides):
    base = dict(
        chain=8, shapes="spatial,spectral", gs="16,32", folds="",
        dropout=0.1, batch=64, modes="fwd,fwdbwd", full_lane=False,
        head_major=False, head_major_proj=False, full_lane_proj=False,
        assert_regression=True, eval=False,
    )
    base.update(overrides)
    return argparse.Namespace(**base)


def test_assert_regression_refuses_nonproduction_sweeps():
    """The thresholds are only valid at production measurement conditions:
    a fold-8 sweep (known-bad ~8.3 ms) must not phantom-trip the gate, and
    an --eval or forced-form run must not false-pass it."""
    kt = _load("kernel_tune")
    assert kt.nonproduction_overrides(_sweep_args()) == []
    for bad in (
        dict(folds="8"),
        dict(eval=True),
        dict(dropout=0.0),
        dict(batch=512),
        dict(head_major=True),
        dict(full_lane_proj=True),
        # thresholds were measured chain-amortized at chain 8: both a
        # chain-1 (dispatch-heavy) and a chain-64 run change amortization
        dict(chain=1),
        dict(chain=64),
        # forced odd-seq slab routes are the Houston A/B controls — the
        # houston thresholds were measured on the default (pad) route
        dict(odd_seq_pad=True),
        dict(odd_seq_fp32=True),
    ):
        assert kt.nonproduction_overrides(_sweep_args(**bad)), bad


def test_assert_regression_fails_on_suspect_trace():
    """A thresholded config measured from an inconsistent trace must FAIL:
    a dropped-events Perfetto export understates per-layer ms and would
    otherwise false-pass the gate (the advisor's round-3 finding)."""
    kt = _load("kernel_tune")
    results = [
        _result("spatial", 16, "fwd", 1.06),
        _result("spatial", 16, "fwdbwd", 3.18),
        _result("spectral", 32, "fwd", 1.17),
        _result("spectral", 32, "fwdbwd", 0.50),  # absurdly fast: lossy trace
    ]
    failures, missing = kt.check_regressions(
        results, suspects={("spectral", 32, "fwdbwd"): "op sum is only 0.12 of envelope"}
    )
    assert missing == []
    assert len(failures) == 1
    key, ms, lim = failures[0]
    assert key == ("spectral", 32, "fwdbwd") and ms != ms  # NaN ms


def test_assert_regression_geometry_tables():
    """Each --geometry judges against its own threshold table (round-4 gate
    extension): the Houston shapes share the (shape, g, mode) keys with
    EnMAP but run ~4x faster — judging them against the EnMAP limits would
    never trip, and vice versa would always trip."""
    kt = _load("kernel_tune")
    results = [
        _result("spatial", 16, "fwd", 0.27),
        _result("spatial", 16, "fwdbwd", 0.80),
        _result("spectral", 32, "fwd", 0.54),
        _result("spectral", 32, "fwdbwd", 1.63),
    ]
    failures, missing = kt.check_regressions(results, geometry="houston")
    assert failures == [] and missing == []
    # the same numbers under the default (enmap) table would false-pass a
    # houston regression: 1.63 is under the enmap 4.11 fwdbwd limit but
    # nearly 2x the houston one
    slow = [_result("spectral", 32, "fwdbwd", 3.0)] + results[:3]
    failures, missing = kt.check_regressions(slow, geometry="houston")
    assert failures == [(("spectral", 32, "fwdbwd"), 3.0, kt.REGRESSION_LIMITS["houston"][("spectral", 32, "fwdbwd")])]
    failures, _ = kt.check_regressions(slow, geometry="enmap")
    assert failures == []


# --- bench_geometries.check_device_regressions --------------------------------

def _georec(metric, dev, mod, suspect=False):
    return {
        "metric": metric, "value": 1000.0, "unit": "cubes/s/chip",
        "device_ms_per_step": dev, "device_module_ms_per_step": mod,
        "trace_suspect": suspect,
    }


def test_geometry_device_gate_within_bounds():
    bg = _load("bench_geometries")
    records = [
        _georec("houston_pretrain_cubes_per_sec_per_chip", 10.9, 11.0),
        _georec("finetune_enmap_bs2_cubes_per_sec_per_chip", 1.31, 1.50, suspect=True),
        _georec("finetune_enmap_bs64_cubes_per_sec_per_chip", 35.0, 35.2),
        _georec("finetune_enmap_bs64_bf16_cubes_per_sec_per_chip", 31.1, 31.3),
        _georec("finetune_houston2018_bs32_bf16_cubes_per_sec_per_chip", 5.3, 5.4),
        _georec("finetune_houston2018_bs32_cubes_per_sec_per_chip", 6.3, 6.4),
    ]
    failures, missing = bg.check_device_regressions(records)
    assert failures == [] and missing == []


def test_geometry_device_gate_trips_and_reports_missing():
    bg = _load("bench_geometries")
    records = [
        _georec("houston_pretrain_cubes_per_sec_per_chip", 13.0, 13.1),  # slow
        _georec("finetune_enmap_bs2_cubes_per_sec_per_chip", 1.31, 1.9),  # envelope slow
        _georec("finetune_enmap_bs64_cubes_per_sec_per_chip", 35.0, 35.2),
        # bf16 leg absent: crashed
        _georec("finetune_houston2018_bs32_bf16_cubes_per_sec_per_chip", 5.3, 5.4),
        _georec("finetune_houston2018_bs32_cubes_per_sec_per_chip", 6.3, 6.4),
    ]
    failures, missing = bg.check_device_regressions(records)
    lim_h = bg.DEVICE_MS_LIMITS["houston_pretrain_cubes_per_sec_per_chip"][1]
    lim_2 = bg.DEVICE_MS_LIMITS["finetune_enmap_bs2_cubes_per_sec_per_chip"][1]
    assert ("houston_pretrain_cubes_per_sec_per_chip", 13.0, lim_h) in failures
    assert ("finetune_enmap_bs2_cubes_per_sec_per_chip", 1.9, lim_2) in failures
    assert missing == ["finetune_enmap_bs64_bf16_cubes_per_sec_per_chip"]


def test_geometry_device_gate_rejects_untrustworthy_traces():
    """A busy-time-gated workload with a suspect trace (op sum << envelope
    on a kernel-dense workload = dropped Perfetto events) must FAIL, not
    false-pass on the understated number; a missing trace likewise. The
    bs-2 leg gates on the module envelope precisely because its suspect
    flag fires legitimately (gap-heavy module), so suspect does NOT fail
    it — but a missing envelope does."""
    bg = _load("bench_geometries")
    records = [
        _georec("houston_pretrain_cubes_per_sec_per_chip", 5.0, 11.0, suspect=True),
        _georec("finetune_enmap_bs2_cubes_per_sec_per_chip", 1.31, None),
        _georec("finetune_enmap_bs64_cubes_per_sec_per_chip", None, None),
        _georec("finetune_enmap_bs64_bf16_cubes_per_sec_per_chip", 31.1, 31.3),
        _georec("finetune_houston2018_bs32_bf16_cubes_per_sec_per_chip", 5.3, 5.4),
        _georec("finetune_houston2018_bs32_cubes_per_sec_per_chip", 6.3, 6.4),
    ]
    failures, missing = bg.check_device_regressions(records)
    assert missing == []
    failed = {m for m, _, _ in failures}
    assert failed == {
        "houston_pretrain_cubes_per_sec_per_chip",
        "finetune_enmap_bs2_cubes_per_sec_per_chip",
        "finetune_enmap_bs64_cubes_per_sec_per_chip",
    }


def test_kernel_tune_trace_suspect(tmp_path):
    """trace_suspect flags over-counted traces AND low op-sum/envelope
    ratios (the sweep's chained-layer traces are ~100% busy, so a low ratio
    there means dropped events, not legitimate idle). It consumes an
    already-parsed trace so sweep cells parse each trace exactly once."""
    from maskedsst_tpu.utils.profiling import parse_device_trace

    kt = _load("kernel_tune")

    def suspect(logdir):
        return kt.trace_suspect(parse_device_trace(logdir))

    good = [
        _device_meta(),
        _op(7, "jit_run", 1000.0, cat=None, extra_args={"run_id": 1}),
        _op(7, "layer.1", 980.0, cat="custom-call"),
    ]
    assert suspect(_write_trace(tmp_path / "good", good)) is None
    dropped = [
        _device_meta(),
        _op(7, "jit_run", 1000.0, cat=None, extra_args={"run_id": 1}),
        _op(7, "layer.1", 300.0, cat="custom-call"),
    ]
    reason = suspect(_write_trace(tmp_path / "drop", dropped))
    assert reason and "0.30" in reason
    doubled = [
        _device_meta(),
        _op(7, "jit_run", 1000.0, cat=None, extra_args={"run_id": 1}),
        _op(7, "layer.1", 900.0, cat="custom-call"),
        _op(7, "group", 950.0, cat="grouping"),
    ]
    reason = suspect(_write_trace(tmp_path / "dbl", doubled))
    assert reason and "overcounted" in reason
    assert suspect(str(tmp_path / "nowhere")) is not None


# --- shared trace parser ------------------------------------------------------

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


def test_parse_device_trace_excludes_control_flow_and_strips_suffixes(tmp_path):
    """The superstep's device `while` CONTAINS its body ops — summing it
    double-counts every inner op (the round-3 Houston 'device > wall' bug).
    The exclusion lives in the ONE shared parser so every consumer
    (kernel_tune, profile_step, bench_geometries) gets it."""
    events = [
        _device_meta(),
        _op(7, "jit_superstep", 1000.0, cat=None, extra_args={"run_id": 1}),
        _op(7, "fused_kernel.1", 500.0, cat="custom-call"),
        _op(7, "fused_kernel.2", 480.0, cat="custom-call"),
        _op(7, "while", 990.0, cat="while"),
        _op(7, "host-event", 123.0, cat="fusion"),  # wrong pid: ignored
    ]
    events[-1]["pid"] = 99
    logdir = _write_trace(tmp_path, events)
    tr = parse_device_trace(logdir)
    assert abs(tr.busy_ms - 0.98) < 1e-9
    assert abs(tr.module_ms - 1.0) < 1e-9
    # .N instance suffixes aggregate under one name (kernel_tune's lookups)
    assert list(tr.by_name) == ["fused_kernel"]
    assert len(tr.by_name["fused_kernel"]) == 2
    assert set(tr.by_cat) == {"custom-call"}
    assert abs(tr.by_cat["custom-call"] - 0.98) < 1e-9
    assert not tr.overcounted


def test_parse_device_trace_no_trace(tmp_path):
    assert parse_device_trace(str(tmp_path)) is None


def test_kernel_tune_device_op_ms_uses_shared_parser(tmp_path):
    kt = _load("kernel_tune")
    events = [
        _device_meta(),
        _op(7, "fused_transformer_layer.3", 700.0, cat="custom-call"),
        _op(7, "while", 990.0, cat="while"),
    ]
    logdir = _write_trace(tmp_path, events)
    ops = kt.device_op_ms(logdir)
    assert ops == {"fused_transformer_layer": [0.7]}
    assert kt.device_op_ms(str(tmp_path / "nowhere")) == {}


# --- bench_geometries.device_total_ms ----------------------------------------

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
    assert "double-counting" in capsys.readouterr().err


def test_device_total_ms_keeps_busy_time_on_gapped_module(tmp_path, capsys):
    """Op sum << envelope is AMBIGUOUS: dropped Perfetto events OR real
    device idle gaps inside the module (tiny-op workloads like the bs-2
    finetune leg). Busy time is still the correct metric in the legitimate
    case — warn and keep the value rather than false-rejecting to NaN (the
    original policy suppressed valid traces)."""
    bg = _load("bench_geometries")
    events = [
        _device_meta(),
        _op(7, "jit_superstep", 1000.0, cat=None, extra_args={"run_id": 1}),
        _op(7, "fusion.1", 300.0),  # 0.3 of the envelope
    ]
    logdir = _write_trace(tmp_path, events)
    assert abs(bg.device_total_ms(logdir) - 0.3) < 1e-9
    assert "idle gaps" in capsys.readouterr().err
    # the tuple form also surfaces the envelope for the JSON record
    busy, module = bg.device_trace_ms(logdir)
    assert (abs(busy - 0.3) < 1e-9) and (abs(module - 1.0) < 1e-9)


def test_device_total_ms_no_trace(tmp_path):
    bg = _load("bench_geometries")
    out = bg.device_total_ms(str(tmp_path))
    assert out != out  # NaN, not an exception


def test_emit_flags_suspect_trace_in_json(capsys):
    """The busy<<envelope ambiguity must survive into the JSON record
    itself (the stderr warning does not): trace_suspect true when the op
    sum is well below the modules envelope, false on a consistent trace,
    false when no trace parsed (nothing to suspect — fields are null)."""
    bg = _load("bench_geometries")
    bg._emit("m", 100.0, device_ms=30.0, steps=10, module_ms=100.0)
    bg._emit("m", 100.0, device_ms=95.0, steps=10, module_ms=100.0)
    bg._emit("m", 100.0, device_ms=float("nan"), steps=10)
    rows = [json.loads(line) for line in capsys.readouterr().out.splitlines()]
    assert [r["trace_suspect"] for r in rows] == [True, False, False]
    assert rows[0]["device_ms_per_step"] == 3.0
    assert rows[2]["device_ms_per_step"] is None


# --- bench.py MFU attribution fields ------------------------------------------

def test_bench_useful_flops_matches_roofline_inventory():
    """bench.py's analytic FLOP count must match the BASELINE.md roofline
    appendix closed form at the reference geometry: per-token-per-layer
    548,864 (spatial, S=64) / 458,752 (spectral, S=20) forward matmul
    FLOPs, 81,920 tokens, depth 4 per stack, x3 for fwd+bwd."""
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from maskedsst_tpu.config import get_pretrain_config

    cfg = get_pretrain_config(
        os.path.join(REPO, "configs/pretrain_config.yaml"),
        os.path.join(REPO, "configs/config.yaml"),
    )
    got = bench._useful_flops_per_step(cfg)
    expected = 3.0 * 81920 * 4 * (548864 + 458752)
    assert got == expected, (got, expected)
