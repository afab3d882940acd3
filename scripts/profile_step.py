#!/usr/bin/env python
"""Per-op device profile of the fused pretraining step.

Runs one superstep of the bench workload (bench.py setup) under
jax.profiler, then parses the exported Perfetto trace and prints device-side
op durations aggregated by HLO category / op name. This replaces guessing at
where the ~35 ms step goes (CLAUDE.md "a real profile would beat all further
guessing").

Usage: python scripts/profile_step.py [--steps K] [--logdir DIR]
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_superstep(steps: int, logdir: str) -> bool:
    import jax.numpy as jnp
    import numpy as np

    from maskedsst_tpu.config import get_pretrain_config
    from maskedsst_tpu.data.device_store import DeviceTileStore, IndexBatcher
    from maskedsst_tpu.data.synthetic import SyntheticCubeDataset
    from maskedsst_tpu.train.pretrainer import Pretrainer
    from maskedsst_tpu.utils.compile_cache import enable_persistent_cache
    from maskedsst_tpu.utils.profiling import trace

    enable_persistent_cache()
    # clear stale traces: parse_trace takes the newest file, and a failed
    # trace this run must not silently report a previous run's numbers
    shutil.rmtree(logdir, ignore_errors=True)
    config = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    config.steps_per_call = steps
    trainer = Pretrainer(config, dtype=jnp.bfloat16)
    dataset = SyntheticCubeDataset(num_tiles=128, n_bands=config.n_bands, labeled=False)
    store = DeviceTileStore(dataset, trainer.mesh)
    batcher = IndexBatcher(len(store), config.batch_size, shuffle=True, drop_last=True, seed=0)
    idx = jnp.asarray(batcher.take(trainer.steps_per_call))
    assert idx.shape[0] == steps, f"built {idx.shape[0]} step chunks, need {steps}"

    state = trainer.state
    state, losses = trainer._train_superstep(state, store.arrays["img"], idx)
    _ = float(losses[-1])  # compile + warm

    with trace(logdir, timeout_s=20.0) as info:
        state, losses = trainer._train_superstep(state, store.arrays["img"], idx)
        _ = float(losses[-1])
    print(f"traced={info['traced']} wall={info['wall_s'] * 1e3:.1f} ms", file=sys.stderr)
    return bool(info["traced"])


def parse_trace(logdir: str, steps: int) -> None:
    # shared accounting (maskedsst_tpu.utils.profiling.parse_device_trace):
    # control-flow envelopes (the superstep's device `while`) are excluded —
    # summing them double-counted every inner op and reported ~2x the real
    # device ms/step on superstep traces (round-3 review finding; the fix
    # originally landed only in bench_geometries)
    from maskedsst_tpu.utils.profiling import parse_device_trace

    tr = parse_device_trace(logdir)
    if tr is None:
        print("no trace produced", file=sys.stderr)
        return
    by_name = {name: sum(durs) for name, durs in tr.by_name.items()}
    by_cat = tr.by_cat
    total = tr.busy_ms
    module_ms = tr.module_ms

    if tr.overcounted:
        print(
            f"WARNING: op events sum to {total:.1f} ms but the XLA Modules "
            f"envelope is only {module_ms:.1f} ms — an uncaught containing-"
            "event kind is double-counting; per-op numbers below are "
            "untrustworthy",
            file=sys.stderr,
        )
    elif tr.undercount_vs_envelope() < 0.9:
        print(
            f"WARNING: op events sum to {total:.1f} ms but the XLA Modules "
            f"envelope is {module_ms:.1f} ms — either the Perfetto export "
            "dropped events (known on short traces, CLAUDE.md) or the module "
            "has real device idle gaps; per-op percentages below may be "
            "untrustworthy",
            file=sys.stderr,
        )

    print(f"\n== device op time over {steps} steps: {total:.2f} ms "
          f"({total / steps:.3f} ms/step) ==")
    print("\n-- by HLO category --")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.2f} ms  {ms / steps:7.3f} ms/step  {100 * ms / total:5.1f}%  {cat}")
    print("\n-- top 25 ops --")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:9.2f} ms  {ms / steps:7.3f} ms/step  {100 * ms / total:5.1f}%  {name}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--logdir", default="/tmp/maskedsst_profile")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        if not run_superstep(args.steps, args.logdir):
            print("trace FAILED — not parsing (stale-trace guard)", file=sys.stderr)
            sys.exit(1)
    parse_trace(args.logdir, args.steps)


if __name__ == "__main__":
    main()
