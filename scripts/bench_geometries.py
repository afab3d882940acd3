#!/usr/bin/env python
"""Secondary-geometry benchmarks (VERDICT r2 #3): the numbers bench.py does
not cover.

  (a) Houston2018 pretrain recipe — 50 bands → 5 spectral blocks, 320
      tokens/cube (configs/finetune_config_houston2018.yaml data section +
      the pretrain hyperparameters). Short spectral sequences are this
      kernel design's weak spot (lane padding at seq 5-20), so this geometry
      guards against a silent perf cliff.
  (b) Finetune train step at the EnMAP recipe (ViTSpatialSpectral classifier,
      shifting-window tiling semantics, Adam) — bench.py tracks pretrain and
      serving only.
  (c) Finetune train step at the Houston2018 recipe (bs 32, 50 bands → the
      seq-5 ODD_SEQ_PAD spectral stack) — the second driver dataset, in the
      driver-default bf16 and the fp32 control (round 5).

Prints one JSON line per workload (same shape as bench.py, extra
``device_ms_per_step`` field from a jax.profiler trace) and is recorded in
BASELINE.md. Wall throughput uses superstep chains + host-fetch sync
(block_until_ready is unreliable through the tunnel, CLAUDE.md); device time
comes from the trace and is deterministic to ±0.001 ms.

Usage: python scripts/bench_geometries.py
       [--workloads houston_pretrain,finetune_enmap,finetune_houston]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_trace_ms(logdir: str) -> tuple:
    """(busy_ms, module_ms) of the newest trace — see device_total_ms.

    Accounting policy lives in maskedsst_tpu.utils.profiling.parse_device_trace
    (shared with kernel_tune/profile_step). Rejection policy here:

    - op sum > module envelope (``overcounted``): an uncaught containing
      event kind is double-counting — the round-3 Houston bug class
      (device > wall). Suppress to NaN; a wrong figure must not be recorded.
    - op sum << envelope: AMBIGUOUS — the Perfetto export drops events on
      short traces, but gap-heavy workloads (the bs-2 finetune leg: tiny
      ops, DMA waits) legitimately idle inside the module span too. busy_ms
      is the correct busy-time metric in the legitimate case, so warn and
      KEEP the value rather than false-rejecting valid traces; the warning
      plus the emitted ``device_module_ms`` field let a reader judge.
    """
    from maskedsst_tpu.utils.profiling import parse_device_trace

    nan = float("nan")
    tr = parse_device_trace(logdir)
    if tr is None:
        return nan, nan
    if tr.overcounted:
        print(
            f"WARNING: device op sum {tr.busy_ms:.1f} ms exceeds the XLA "
            f"Modules envelope {tr.module_ms:.1f} ms — an uncaught "
            "containing-event kind is double-counting; suppressing "
            "device_ms_per_step",
            file=sys.stderr,
        )
        return nan, tr.module_ms
    if tr.undercount_vs_envelope() < 0.9:
        print(
            f"WARNING: device op sum {tr.busy_ms:.1f} ms is well below the "
            f"XLA Modules envelope {tr.module_ms:.1f} ms — either the "
            "Perfetto export dropped events (short traces) or the module "
            "has real device idle gaps; keeping the op sum (busy time)",
            file=sys.stderr,
        )
    return tr.busy_ms, tr.module_ms


def device_total_ms(logdir: str) -> float:
    """Busy-time metric alone (NaN when missing/untrustworthy)."""
    return device_trace_ms(logdir)[0]


def _emit(metric: str, cubes_per_sec_per_chip: float, device_ms: float, steps: int,
          module_ms: float = float("nan")) -> dict:
    # a low busy/envelope ratio is ambiguous (dropped Perfetto events OR real
    # device idle inside the module span); the stderr warning does not
    # survive into the JSON record, so flag the ambiguity in-band — a reader
    # comparing runs must not mistake a lossy trace for a speedup
    suspect = (
        device_ms == device_ms
        and module_ms == module_ms
        and module_ms > 0
        and device_ms / module_ms < 0.9
    )
    rec = {
        "metric": metric,
        "value": round(cubes_per_sec_per_chip, 1),
        "unit": "cubes/s/chip",
        "device_ms_per_step": round(device_ms / steps, 3) if device_ms == device_ms else None,
        # the XLA Modules envelope (busy + device idle gaps): lets a reader
        # judge an op-sum-vs-envelope warning without re-running the trace
        "device_module_ms_per_step": round(module_ms / steps, 3) if module_ms == module_ms else None,
        "trace_suspect": suspect,
    }
    print(json.dumps(rec), flush=True)
    return rec


# --assert thresholds on the trace DEVICE time per step (wall throughput on
# this shared chip varies ~2x with load and cannot gate; device timings are
# deterministic to ±0.001 ms — BASELINE.md "Measured status (round 3/4)").
# Limits are ≥8% over the recorded numbers (houston 10.88, finetune bs64
# fp32 34.98 / bf16 31.08 ms/step). The bs-2 reference-recipe leg gates on
# the MODULE-ENVELOPE time instead: its trace is legitimately gap-heavy
# (tiny ops + DMA waits idle inside the module span), so the op-sum busy
# time trips the suspect flag on every run — the envelope (a handful of
# large events, not subject to the dropped-op-events Perfetto failure) is
# the stable per-step anchor there (round-4 measured 1.32 busy / 1.35
# envelope ms/step; the suspect flag is load-dependent — gap-light runs
# land within 0.9 of the envelope, loaded ones don't).
DEVICE_MS_LIMITS = {
    # 10.317 ms under the round-4 ODD_SEQ_PAD route (was 10.878 fp32-I/O)
    "houston_pretrain_cubes_per_sec_per_chip": ("device_ms_per_step", 11.2),
    "finetune_enmap_bs2_cubes_per_sec_per_chip": ("device_module_ms_per_step", 1.55),
    "finetune_enmap_bs64_cubes_per_sec_per_chip": ("device_ms_per_step", 37.8),
    "finetune_enmap_bs64_bf16_cubes_per_sec_per_chip": ("device_ms_per_step", 33.6),
    # round-5 measured: bf16 5.331 / fp32 6.259 ms/step (houston finetune,
    # bs 32, seq-5 ODD_SEQ_PAD spectral stack)
    "finetune_houston2018_bs32_bf16_cubes_per_sec_per_chip": ("device_ms_per_step", 5.8),
    "finetune_houston2018_bs32_cubes_per_sec_per_chip": ("device_ms_per_step", 6.8),
}


def check_device_regressions(records, limits=None):
    """(failures, missing) of the emitted records against DEVICE_MS_LIMITS.

    A thresholded metric absent from ``records`` (workload skipped or
    crashed) is reported missing — absence is the worst regression, not a
    pass. A record whose gated field is None (no/untrustworthy trace) or
    whose busy-time gate rides a suspect trace FAILS: a lossy trace
    understates device time and would otherwise false-pass (same policy as
    kernel_tune.check_regressions)."""
    limits = DEVICE_MS_LIMITS if limits is None else limits
    failures, seen = [], set()
    for rec in records:
        entry = limits.get(rec["metric"])
        if entry is None:
            continue
        field, lim = entry
        seen.add(rec["metric"])
        ms = rec.get(field)
        if ms is None:
            print(f"device check {rec['metric']}: {field} missing (trace failed) ... FAIL")
            failures.append((rec["metric"], float("nan"), lim))
        elif field == "device_ms_per_step" and rec.get("trace_suspect"):
            print(f"device check {rec['metric']}: trace suspect (op sum below envelope) ... FAIL")
            failures.append((rec["metric"], float("nan"), lim))
        else:
            status = "ok" if ms <= lim else "REGRESSION"
            print(f"device check {rec['metric']}: {field} {ms:.3f} ms <= {lim} ... {status}")
            if ms > lim:
                failures.append((rec["metric"], ms, lim))
    return failures, sorted(set(limits) - seen)


def bench_houston_pretrain(steps: int) -> dict:
    import jax.numpy as jnp

    from maskedsst_tpu.config import get_pretrain_config
    from maskedsst_tpu.data.device_store import DeviceTileStore, IndexBatcher
    from maskedsst_tpu.data.synthetic import SyntheticCubeDataset
    from maskedsst_tpu.train.pretrainer import Pretrainer
    from maskedsst_tpu.utils.profiling import trace

    config = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    # Houston2018 data section (configs/config.yaml): 48 CASI bands
    # zero-padded to 50 → 5 spectral blocks of 10; 20 classes; samples
    # arrive at image_size already (no 64x64 tile crop, like the houston
    # patch datasets), hence tile_size=image_size below
    config.dataset = "houston2018"
    config.n_bands = 50
    config.n_classes = 20
    config.steps_per_call = steps
    trainer = Pretrainer(config, dtype=jnp.bfloat16, tile_size=config.image_size)
    dataset = SyntheticCubeDataset(
        num_tiles=2048, n_bands=50, tile_size=config.image_size, labeled=False
    )
    store = DeviceTileStore(dataset, trainer.mesh)
    batcher = IndexBatcher(len(store), config.batch_size, shuffle=True, drop_last=True, seed=0)
    idx = jnp.asarray(batcher.take(steps))

    state = trainer.state
    state, losses = trainer._train_superstep(state, store.arrays["img"], idx)
    _ = float(losses[-1])  # compile + warm
    times = []
    for _i in range(4):
        t0 = time.perf_counter()
        state, losses = trainer._train_superstep(state, store.arrays["img"], idx)
        _ = float(losses[-1])
        times.append(time.perf_counter() - t0)
    times.sort()
    wall = times[len(times) // 2]

    logdir = "/tmp/bench_geo/houston"
    shutil.rmtree(logdir, ignore_errors=True)
    with trace(logdir, timeout_s=20.0) as info:
        state, losses = trainer._train_superstep(state, store.arrays["img"], idx)
        _ = float(losses[-1])
    dev, mod = device_trace_ms(logdir) if info["traced"] else (float("nan"),) * 2
    return _emit(
        "houston_pretrain_cubes_per_sec_per_chip",
        steps * config.batch_size / wall / trainer.mesh.devices.size,
        dev, steps, module_ms=mod,
    )


def bench_finetune_enmap(steps: int, batch: int = None, bf16: bool = False) -> dict:
    return _bench_finetune("enmap", steps, batch=batch, bf16=bf16)


def bench_finetune_houston(steps: int, bf16: bool = False) -> dict:
    """Houston2018 finetune recipe (bs 32, 50 bands → 5 spectral blocks):
    the odd-seq ODD_SEQ_PAD kernel route under the supervised CE step —
    the one driver geometry bench_geometries didn't record before round 5.
    Houston samples arrive at image_size (no tile crop), so tiles are built
    at 8x8 directly."""
    return _bench_finetune("houston2018", steps, bf16=bf16)


def _bench_finetune(dataset_name: str, steps: int, batch: int = None,
                    bf16: bool = False) -> dict:
    import jax.numpy as jnp
    import numpy as np

    from maskedsst_tpu.config import get_finetune_config
    from maskedsst_tpu.train.factory import build_finetune_model
    from maskedsst_tpu.train.finetuner import Finetuner
    from maskedsst_tpu.utils.profiling import trace

    from maskedsst_tpu.data.device_store import DeviceTileStore, IndexBatcher
    from maskedsst_tpu.data.synthetic import SyntheticCubeDataset

    config = get_finetune_config(
        f"configs/finetune_config_{dataset_name}.yaml", "configs/config.yaml"
    )
    if batch is not None:
        config.batch_size = batch
    model, kwargs = build_finetune_model(
        config, dtype=jnp.bfloat16 if bf16 else None
    )
    ft = Finetuner(config, model, **kwargs)

    # drive the SAME path fit() uses for HBM-resident data: superstep scans
    # of `steps` train steps per dispatch over a DeviceTileStore (a
    # per-dispatch _train_step loop would measure the ~27 ms tunnel RTT,
    # not the trainer — that is how this bench originally understated the
    # reference-recipe bs-2 number by ~5x)
    # houston patches arrive at image_size already (no 64x64 tile crop —
    # Finetuner crop is gated on dataset in ("dfc", "worldcover"))
    tile = 64 if dataset_name == "enmap" else config.image_size
    dataset = SyntheticCubeDataset(
        num_tiles=max(256, 2 * config.batch_size),
        n_bands=config.n_bands,
        n_classes=config.n_classes,
        tile_size=tile,
        labeled=True,
    )
    store = DeviceTileStore(dataset, ft.mesh)
    batcher = IndexBatcher(
        len(store), config.batch_size, shuffle=True, drop_last=True, seed=0
    )
    idx = jnp.asarray(batcher.take(steps))
    imgs, labels = store.arrays["img"], store.arrays["label"]

    state = ft.state
    state, metrics = ft._train_superstep(state, imgs, labels, idx)
    _ = float(np.asarray(metrics["loss"])[-1])  # compile + warm
    times = []
    for _i in range(4):
        t0 = time.perf_counter()
        state, metrics = ft._train_superstep(state, imgs, labels, idx)
        _ = float(np.asarray(metrics["loss"])[-1])
        times.append(time.perf_counter() - t0)
    times.sort()
    wall = times[len(times) // 2]

    logdir = "/tmp/bench_geo/finetune"
    shutil.rmtree(logdir, ignore_errors=True)
    with trace(logdir, timeout_s=30.0) as info:
        state, metrics = ft._train_superstep(state, imgs, labels, idx)
        _ = float(np.asarray(metrics["loss"])[-1])
    dev, mod = device_trace_ms(logdir) if info["traced"] else (float("nan"),) * 2
    tag = "_bf16" if bf16 else ""
    return _emit(
        f"finetune_{dataset_name}_bs{config.batch_size}{tag}_cubes_per_sec_per_chip",
        steps * config.batch_size / wall / ft.mesh.devices.size,
        dev, steps, module_ms=mod,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--workloads", default="houston_pretrain,finetune_enmap,finetune_houston"
    )
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument(
        "--assert", dest="assert_", action="store_true",
        help="after the benchmarks, check every recorded workload's device "
        "time against DEVICE_MS_LIMITS and exit non-zero on a regression "
        "(requires the default --workloads so all thresholded metrics run)")
    args = ap.parse_args()

    from maskedsst_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    records = []
    for w in args.workloads.split(","):
        if w == "houston_pretrain":
            records.append(bench_houston_pretrain(args.steps))
        elif w == "finetune_enmap":
            # the recipe's own batch (2, finetune_config_enmap.yaml) is
            # dispatch-bound; also measure batch 64 for a device-saturating
            # number comparable to the pretrain bench, plus the --bf16
            # opt-in path (the pretrain bench runs bf16 — this is the
            # apples-to-apples finetune number)
            records.append(bench_finetune_enmap(max(8, args.steps // 2)))
            records.append(bench_finetune_enmap(max(8, args.steps // 2), batch=64))
            records.append(bench_finetune_enmap(max(8, args.steps // 2), batch=64, bf16=True))
        elif w == "finetune_houston":
            # the second driver recipe (finetune_config_houston2018.yaml,
            # bs 32, 50 bands -> seq-5 spectral stack): exercises the
            # ODD_SEQ_PAD kernel route under the supervised CE step, in the
            # driver-default bf16 and the --fp32 control
            records.append(bench_finetune_houston(max(8, args.steps // 2), bf16=True))
            records.append(bench_finetune_houston(max(8, args.steps // 2)))
        else:
            raise SystemExit(f"unknown workload {w}")

    if args.assert_:
        failures, missing = check_device_regressions(records)
        if missing:
            sys.exit(
                f"--assert: thresholded workloads not measured (crashed or "
                f"restricted --workloads): {missing}"
            )
        if failures:
            sys.exit(f"geometry device-time regression: {failures}")
        print("device check: all measured workloads within bounds")


if __name__ == "__main__":
    main()
