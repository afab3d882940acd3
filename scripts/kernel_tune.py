#!/usr/bin/env python
"""Device-time tuner for the fused transformer layer kernels.

Earlier rounds tuned block size / folding via wall-clock timings through the
TPU tunnel, which carries ~2x run-to-run noise and a fixed ~27 ms dispatch
cost. This harness instead reads exact per-call device durations from a
jax.profiler trace, so sub-10% effects are measurable.

For each (shape, block rows g, fold, dropout, direction) it runs a chain of
dependent layer calls inside one jit (so dispatch cost is amortized and the
device pipeline is realistic), traces it, and reports device ms per call.

Usage: python scripts/kernel_tune.py [--chain 8]
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM, HEADS, DH, MLP = 96, 8, 64, 64


def device_op_ms(logdir: str) -> dict:
    """name → list of durations (ms) for device XLA ops in the last trace.

    Thin wrapper over the shared trace-accounting policy
    (maskedsst_tpu.utils.profiling.parse_device_trace)."""
    from maskedsst_tpu.utils.profiling import parse_device_trace

    tr = parse_device_trace(logdir)
    return dict(tr.by_name) if tr is not None else {}


def trace_suspect(tr) -> "str | None":
    """None when the trace accounting is trustworthy, else a reason string.

    Takes an already-parsed trace (parse_device_trace result, possibly None)
    so sweep cells parse each multi-MB trace exactly once. The regression
    gate must never judge an inconsistent trace: an over-counted one (op sum
    > modules envelope: an uncaught containing event kind) overstates
    per-layer ms and phantom-trips, while a Perfetto export that silently
    dropped op events (known failure on short traces) understates it and
    FALSE-PASSES. Unlike bench_geometries' gap-heavy workloads, the sweep's
    chained-layer traces are ~100% custom-call busy (profile_step measured
    97.3%), so a low op-sum/envelope ratio here means dropped events, not
    legitimate idle."""
    if tr is None:
        return "no trace parsed"
    if tr.overcounted:
        return (
            f"overcounted: op sum {tr.busy_ms:.1f} ms > modules envelope "
            f"{tr.module_ms:.1f} ms"
        )
    ratio = tr.undercount_vs_envelope()
    if ratio < 0.9:
        return (
            f"op sum is only {ratio:.2f} of the {tr.module_ms:.1f} ms modules "
            "envelope (Perfetto export dropped events?)"
        )
    return None


# thresholds from BASELINE.md's roofline appendix (≥8% over the round-3
# device-time numbers at the production block sizes; trace timings are
# deterministic to ±0.001 ms, so a trip is a real regression, not noise),
# keyed per --geometry. The EnMAP recipe (200 bands → 20 blocks, seq 64/20)
# is the flagship; Houston2018 (50 bands → 5 blocks, seq 64/5) is the
# geometry that CRASHED on real TPU in round 3 (odd-seq bf16 slab packing,
# fused_layer._odd_packed_slab) — its spectral entries gate the ODD_SEQ_PAD
# masked-pad route specifically, which no EnMAP shape exercises.
REGRESSION_LIMITS = {
    "enmap": {
        ("spatial", 16, "fwd"): 1.15,
        ("spatial", 16, "fwdbwd"): 3.43,
        ("spectral", 32, "fwd"): 1.27,
        ("spectral", 32, "fwdbwd"): 4.11,
    },
    # round-4 device measurements (ms/layer, chain 8): spatial (320, 64)
    # g16 fwd 0.266 / fwdbwd 0.804; spectral (4096, 5) g32 through the
    # ODD_SEQ_PAD route (the production default since round 4) fwd 0.500 /
    # fwdbwd 1.539 — ≥8% headroom applied
    "houston": {
        ("spatial", 16, "fwd"): 0.29,
        ("spatial", 16, "fwdbwd"): 0.87,
        ("spectral", 32, "fwd"): 0.54,
        ("spectral", 32, "fwdbwd"): 1.67,
    },
}

# tokens per cube along each stack, per geometry: the spatial stack sees
# [B*blocks, patches] rows×seq, the spectral stack [B*patches, blocks]
GEOMETRY_SHAPES = {
    "enmap": {"spatial": (20, 64), "spectral": (64, 20)},
    "houston": {"spatial": (5, 64), "spectral": (64, 5)},
}


def nonproduction_overrides(args) -> list:
    """Sweep overrides that invalidate the regression thresholds.

    The thresholds were measured under production conditions; any override
    that changes them (fold-8 is known-bad at ~8.3 ms, --eval forces
    dropout 0, --batch changes row counts, forced kernel forms measure the
    A/B control) makes the comparison meaningless — --assert-regression
    refuses rather than phantom-trip or false-pass."""
    overrides = []
    if args.dropout != 0.1:
        overrides.append(f"--dropout {args.dropout}")
    if args.batch != 64:
        overrides.append(f"--batch {args.batch}")
    if args.eval:
        overrides.append("--eval")
    if args.folds:
        overrides.append(f"--folds {args.folds}")
    if args.full_lane or args.head_major:
        overrides.append("--full-lane/--head-major")
    if args.head_major_proj or args.full_lane_proj:
        overrides.append("--head-major-proj/--full-lane-proj")
    if getattr(args, "odd_seq_pad", False) or getattr(args, "odd_seq_fp32", False):
        overrides.append("--odd-seq-pad/--odd-seq-fp32")
    if args.chain != 8:
        # thresholds were measured chain-amortized at chain 8; a different
        # chain length changes dispatch/pipelining amortization
        overrides.append(f"--chain {args.chain}")
    return overrides


def check_regressions(results, limits=None, suspects=None, geometry="enmap"):
    """(failures, missing) against the production thresholds.

    ``results`` is the sweep's [(key, label, ms, _), ...] with key the
    structured (shape, g, mode) tuple — no label parsing (a label-format
    tweak must not silently break the gate). A thresholded config ABSENT
    from results (compile/trace failure, or a sweep restricted below
    --gs 16,32 --modes fwd,fwdbwd) is reported in ``missing`` — absence is
    the only signal a config errored, and it is the worst regression, not a
    pass. ``suspects`` maps keys whose trace failed the consistency check
    (see :func:`trace_suspect`) to a reason — those configs FAIL rather
    than judge a number from an untrustworthy trace (a dropped-events
    export understates ms and would false-pass).

    The thresholds are only valid for PRODUCTION measurement conditions
    (auto fold, default dropout/batch/chain, default kernel forms,
    train-mode forward): main() refuses --assert-regression under any sweep
    override that changes them, so a fold-8 or --eval run can neither
    phantom-trip nor false-pass the gate."""
    limits = REGRESSION_LIMITS[geometry] if limits is None else limits
    failures = []
    measured = set()
    for key, _label, ms, _ in results:
        lim = limits.get(key)
        if lim is None:
            continue
        measured.add(key)
        reason = (suspects or {}).get(key)
        if reason is not None:
            print(f"regression check {key}: trace untrustworthy ({reason}) ... FAIL")
            failures.append((key, float("nan"), lim))
            continue
        status = "ok" if ms <= lim else "REGRESSION"
        print(f"regression check {key}: {ms:.3f} ms <= {lim} ... {status}")
        if ms > lim:
            failures.append((key, ms, lim))
    return failures, sorted(set(limits) - measured)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument(
        "--geometry", default="enmap", choices=sorted(GEOMETRY_SHAPES),
        help="recipe geometry the token shapes derive from (enmap: seq "
        "64/20; houston: seq 64/5, spectral rides the odd-seq ODD_SEQ_PAD "
        "slab route). --assert-regression uses the matching threshold "
        "table.")
    ap.add_argument("--shapes", default="spatial,spectral")
    ap.add_argument("--gs", default="")
    ap.add_argument("--folds", default="", help="comma list of fold overrides (spectral-style short-seq folding)")
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument(
        "--batch", type=int, default=64,
        help="cube batch size the row counts scale from (64 = training "
        "shapes; 512 = the serving-bench geometry, fwd-only path)")
    ap.add_argument("--modes", default="fwd,fwdbwd",
                    help="comma list from {fwd,fwdbwd}")
    ap.add_argument(
        "--full-lane", action="store_true",
        help="force the FULL_LANE_QKV kernel variant (single [GS,D]x[D,3I] "
        "QKV matmul + per-head lane-slice scratch staging) — the production "
        "default")
    ap.add_argument(
        "--head-major", action="store_true",
        help="force the head-major batched QKV form (the A/B control)")
    ap.add_argument(
        "--head-major-proj", action="store_true",
        help="force the head-major batched output-projection form in BOTH "
        "kernels (A/B control; default is the measured per-kernel 'auto' "
        "rule)")
    ap.add_argument(
        "--full-lane-proj", action="store_true",
        help="force the full-lane output-projection form in BOTH kernels")
    ap.add_argument(
        "--odd-seq-pad", action="store_true",
        help="force the ODD_SEQ_PAD route for odd-seq bf16 slabs (zero-pad "
        "seq+1 with a masked pad key, bf16 I/O kept) — the production "
        "default since round 4")
    ap.add_argument(
        "--odd-seq-fp32", action="store_true",
        help="force the fp32-I/O fallback for odd-seq bf16 slabs — the A/B "
        "control for the Houston spectral geometry")
    ap.add_argument(
        "--assert-regression", action="store_true",
        help="after the sweep, check the production configurations against "
        "BASELINE.md's regression thresholds and exit non-zero on a trip "
        "(run with --gs 16,32 --modes fwd,fwdbwd)")
    ap.add_argument(
        "--eval", action="store_true",
        help="measure the DETERMINISTIC serving forward (train=False, "
        "forces dropout 0 — the eval_fwd block-size path); without this, "
        "fwd mode measures the dropout-active training forward")
    args = ap.parse_args()
    if args.eval:
        args.dropout = 0.0
    if args.assert_regression and not args.gs:
        # gate runs only need the thresholded block sizes; the exploratory
        # default sweep adds minutes and a known-OOM point (spatial g=64)
        # whose FAILED line reads like a gate failure
        args.gs = "16,32"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskedsst_tpu.ops import fused_layer as fl
    from maskedsst_tpu.utils.compile_cache import enable_persistent_cache
    from maskedsst_tpu.utils.profiling import trace

    enable_persistent_cache()
    if args.full_lane:
        fl.FULL_LANE_QKV = True
    elif args.head_major:
        fl.FULL_LANE_QKV = False
    if args.head_major_proj:
        fl.FULL_LANE_PROJ = False
    elif args.full_lane_proj:
        fl.FULL_LANE_PROJ = True
    if args.odd_seq_pad:
        fl.ODD_SEQ_PAD = True
    elif args.odd_seq_fp32:
        fl.ODD_SEQ_PAD = False

    rng = np.random.default_rng(0)
    suspects = {}

    def mk_params():
        def r(*sh):
            return jnp.asarray(rng.standard_normal(sh) * 0.02, jnp.float32)

        inner = HEADS * DH
        return fl.LayerParams(
            ln1_scale=jnp.ones((DIM,)), ln1_bias=jnp.zeros((DIM,)),
            wqkv=r(DIM, 3 * inner), wout=r(inner, DIM), bout=jnp.zeros((DIM,)),
            ln2_scale=jnp.ones((DIM,)), ln2_bias=jnp.zeros((DIM,)),
            w1=r(DIM, MLP), b1=jnp.zeros((MLP,)), w2=r(MLP, DIM), b2=jnp.zeros((DIM,)),
        )

    SHAPES = {
        name: (args.batch * blocks, seq)  # [b*c, hw] / [b*hw, c] tokens
        for name, (blocks, seq) in GEOMETRY_SHAPES[args.geometry].items()
    }

    params = mk_params()
    chain = args.chain
    results = []

    for shape_name in args.shapes.split(","):
        b, s = SHAPES[shape_name]
        x0 = jnp.asarray(rng.standard_normal((b, s, DIM)), jnp.bfloat16)
        default_g = fl._choose_block(b, s)
        gs = [int(v) for v in args.gs.split(",") if v] or sorted(
            {default_g, 4, 8, 16, 32, 64} & {g for g in range(1, b + 1) if b % g == 0}
        )
        folds = [int(f) for f in args.folds.split(",") if f] or [None]
        for g in gs:
          for fold in folds:
            # honor the forced fold EXACTLY or refuse loudly — a silent
            # coercion to 1 would label a fold-1 measurement 'f=N' (an
            # earlier cap-based fallback here mislabeled fold-8 sweeps at
            # seq 20; the production cap lives in _choose_fold itself)
            if fold is not None and g % fold != 0:
                print(f"g={g} f={fold}: skipped (fold must divide g)")
                continue
            orig_choose = fl._choose_block
            orig_fold = fl._choose_fold
            fl._choose_block = lambda *a, **k: g
            if fold is not None:
                fl._choose_fold = (lambda f: lambda seq, gg: f)(fold)
            try:
                for mode in args.modes.split(","):
                  try:
                    def run_fwd(x):
                        for i in range(chain):
                            x = fl.fused_transformer_layer(
                                x, params, jnp.int32(i), HEADS, DH,
                                jnp.bfloat16, args.dropout, not args.eval,
                            )
                        return x

                    if mode == "fwd":
                        fn = jax.jit(run_fwd)
                        out = fn(x0)
                        _ = np.asarray(out)[:1, :1, :1]
                        logdir = f"/tmp/ktune/{shape_name}_g{g}_f{fold}_{mode}"
                        shutil.rmtree(logdir, ignore_errors=True)
                        with trace(logdir, timeout_s=20.0) as tinfo:
                            out = fn(x0)
                            _ = np.asarray(out)[:1, :1, :1]
                        if not tinfo["traced"]:
                            print(f"{shape_name} g={g} f={fold} {mode}: trace FAILED, skipping")
                            continue
                    else:
                        loss_fn = lambda x: jnp.sum(run_fwd(x).astype(jnp.float32))
                        fn = jax.jit(jax.grad(loss_fn))
                        out = fn(x0)
                        _ = np.asarray(out)[:1, :1, :1]
                        logdir = f"/tmp/ktune/{shape_name}_g{g}_f{fold}_{mode}"
                        shutil.rmtree(logdir, ignore_errors=True)
                        with trace(logdir, timeout_s=20.0) as tinfo:
                            out = fn(x0)
                            _ = np.asarray(out)[:1, :1, :1]
                        if not tinfo["traced"]:
                            print(f"{shape_name} g={g} f={fold} {mode}: trace FAILED, skipping")
                            continue
                    from maskedsst_tpu.utils.profiling import parse_device_trace

                    tr = parse_device_trace(logdir)
                    ops = dict(tr.by_name) if tr is not None else {}
                    bad = trace_suspect(tr)
                    if bad is not None:
                        suspects[(shape_name, g, mode)] = bad
                        print(f"{shape_name} g={g} f={fold} {mode}: TRACE SUSPECT — {bad}")
                    # fwd pallas op name contains 'fused_layer' via the kernel
                    # function name; fall back to custom-call aggregation
                    tot = {
                        n: (sum(v), len(v))
                        for n, v in ops.items()
                        if n in ("run_fwd", "jvp__", "transpose_jvp___")
                        or "transformer" in n
                    }
                    label = f"{shape_name} g={g:3d} f={fold if fold is not None else 'auto'} {mode:6s} drop={args.dropout}"
                    if tot:
                        alln = sum(t for t, _ in tot.values())
                        counts = {n: c for n, (t, c) in tot.items()}
                        results.append(((shape_name, g, mode), label, alln / chain, counts))
                        print(f"{label}: {alln / chain:7.3f} ms/layer  {counts}")
                    else:
                        print(f"{label}: no kernel ops found; keys={list(ops)[:8]}")
                  except Exception as exc:
                    msg = str(exc)
                    short = "VMEM OOM" if "vmem" in msg.lower() else msg.splitlines()[0][:90]
                    print(f"{shape_name} g={g:3d} f={fold} {mode:6s}: FAILED ({short})")
            finally:
                fl._choose_block = orig_choose
                fl._choose_fold = orig_fold

    print("\n== summary (ms per layer call chain-amortized) ==")
    for _key, label, ms, _ in sorted(results, key=lambda r: r[1]):
        print(f"{ms:8.3f}  {label}")

    if args.assert_regression:
        overrides = nonproduction_overrides(args)
        if overrides:
            sys.exit(
                "--assert-regression requires production measurement "
                f"conditions; drop the overrides: {', '.join(overrides)}"
            )
        failures, missing = check_regressions(
            results, suspects=suspects, geometry=args.geometry
        )
        if missing:
            sys.exit(
                f"--assert-regression: thresholded configurations not "
                f"measured (compile/trace failure or restricted sweep): "
                f"{missing} (run with --gs 16,32 --modes fwd,fwdbwd)"
            )
        if failures:
            sys.exit(f"kernel perf regression: {failures}")
        print("regression check: all measured configurations within bounds")


if __name__ == "__main__":
    main()
