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
import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

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
    chunks: list = []
    while len(chunks) < trainer.steps_per_call:  # batcher reshuffles per epoch
        chunks.extend(list(batcher))
    idx = jnp.asarray(np.stack(chunks[: trainer.steps_per_call]))
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
    paths = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace produced", file=sys.stderr)
        return
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    events = d.get("traceEvents", [])
    # device pid: process named /device:TPU:* ; XLA Ops thread has hlo events
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "/device:" in e["args"].get("name", "")
    }
    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    module_ms = 0.0  # "XLA Modules" envelope (no hlo_category)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category")
        dur_ms = e.get("dur", 0.0) / 1e3  # trace durs are in us
        if cat is None:
            # module-level envelope / python events; jit_ modules carry the
            # run_id arg — sum them as the envelope to sanity-check against
            if "run_id" in args or e.get("name", "").startswith("jit_"):
                module_ms += dur_ms
            continue
        name = e.get("name", "?")
        # strip trailing .N suffixes so repeated instances aggregate
        base = name.rsplit(".", 1)
        if len(base) == 2 and base[1].isdigit():
            name = base[0]
        by_name[name] += dur_ms
        by_cat[cat] += dur_ms
        total += dur_ms

    if module_ms > 0 and total < 0.9 * module_ms:
        print(
            f"WARNING: op events sum to {total:.1f} ms but the XLA Modules "
            f"envelope is {module_ms:.1f} ms — the Perfetto export dropped "
            "events (known on short traces, CLAUDE.md); per-op percentages "
            "below are untrustworthy",
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
