#!/usr/bin/env python
"""bf16 stability soak at the reference pretrain recipe (VERDICT r4 #2).

bf16 compute became the driver default in round 4 on 20 steps of trajectory
evidence; the reference recipe is 800 epochs (configs/pretrain_config.yaml).
This script runs a SUSTAINED on-chip pretrain (default 2,048 steps at the
EnMAP geometry, superstep-chained) twice — bf16 compute and an fp32 control
from identical init/data/mask streams — and records both loss trajectories,
the final-window loss delta, and NaN-free-ness to SOAK_r05.json.

Pass/fail: every loss finite in both runs, and the mean loss over the final
window within ``--rel-tol`` (default 0.05) of the fp32 control. Tolerance
rationale in BASELINE.md (round-5 section).

Usage: python scripts/bf16_soak.py [--steps 2048] [--rel-tol 0.05]
                                   [--out SOAK_r05.json] [--assert]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(dtype_name: str, steps: int, steps_per_call: int):
    import jax.numpy as jnp
    import numpy as np

    from maskedsst_tpu.config import get_pretrain_config
    from maskedsst_tpu.data.device_store import DeviceTileStore, IndexBatcher
    from maskedsst_tpu.data.synthetic import SyntheticCubeDataset
    from maskedsst_tpu.train.pretrainer import Pretrainer

    config = get_pretrain_config(
        "configs/pretrain_config.yaml", "configs/config.yaml"
    )
    config.steps_per_call = steps_per_call
    dtype = {"bf16": jnp.bfloat16, "fp32": None}[dtype_name]
    trainer = Pretrainer(config, dtype=dtype)

    # identical data/index/mask streams across legs: same dataset seed, same
    # batcher seed, and the mask/dropout keys ride the (identical) TrainState
    # rng chain
    dataset = SyntheticCubeDataset(
        num_tiles=128, n_bands=config.n_bands, labeled=False
    )
    store = DeviceTileStore(dataset, trainer.mesh)
    batcher = IndexBatcher(
        len(store), config.batch_size, shuffle=True, drop_last=True, seed=0
    )

    state = trainer.state
    losses = []
    t0 = time.perf_counter()
    done = 0
    while done < steps:
        k = min(steps_per_call, steps - done)
        if k < steps_per_call:
            break  # tail smaller than a superstep: stop at the last full one
        idx = jnp.asarray(batcher.take(k))
        state, chunk = trainer._train_superstep(state, store.arrays["img"], idx)
        losses.append(np.asarray(chunk, np.float64))
        done += k
    wall = time.perf_counter() - t0
    losses = np.concatenate(losses)
    return losses, wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--steps-per-call", type=int, default=256)
    ap.add_argument("--window", type=int, default=256,
                    help="final window (steps) for the convergence comparison")
    ap.add_argument("--rel-tol", type=float, default=0.05)
    ap.add_argument("--out", default="SOAK_r05.json")
    ap.add_argument("--assert", dest="do_assert", action="store_true",
                    help="exit 1 when NaNs appear or the final-window delta "
                    "exceeds --rel-tol")
    ap.add_argument("--stride", type=int, default=16,
                    help="trajectory subsampling stride in the JSON record")
    args = ap.parse_args()

    if args.steps < 1:
        ap.error("--steps must be >= 1")
    if args.steps_per_call < 1:
        ap.error("--steps-per-call must be >= 1")
    if args.stride < 1:
        ap.error("--stride must be >= 1")
    if args.window < 1:
        # window 0 would compare FULL-run means ([-0:] is the whole array)
        # and silently change the --assert verdict
        ap.error("--window must be >= 1")
    # a superstep never exceeds the total budget (the run_leg tail-break
    # discards sub-superstep tails; without this clamp --steps < the default
    # --steps-per-call would run zero steps and die on an empty concatenate)
    args.steps_per_call = min(args.steps_per_call, args.steps)

    from maskedsst_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import numpy as np

    # run_leg discards a sub-superstep tail; record what actually RUNS so
    # the JSON never overstates the soak length
    actual = (args.steps // args.steps_per_call) * args.steps_per_call
    if actual != args.steps:
        print(f"note: {args.steps - actual}-step tail below one superstep "
              f"is discarded; soaking {actual} steps per leg")
    record = {"steps": actual, "steps_requested": args.steps,
              "recipe": "pretrain_config.yaml (EnMAP "
              "geometry, bs 64, AdamW 8e-3, mask 0.70 tube, dropout 0.1)",
              "legs": {}}
    finals = {}
    ok = True
    for leg in ("bf16", "fp32"):
        losses, wall = run_leg(leg, args.steps, args.steps_per_call)
        finite = bool(np.isfinite(losses).all())
        final = float(losses[-args.window :].mean())
        finals[leg] = final
        record["legs"][leg] = {
            "steps": int(losses.size),
            "wall_s": round(wall, 1),
            "nan_free": finite,
            "first_loss": float(losses[0]),
            "final_window_mean": final,
            "min_loss": float(losses.min()),
            "max_loss_after_warmup": float(losses[min(64, losses.size - 1) :].max()),
            "trajectory_stride": args.stride,
            "trajectory": [round(float(x), 6) for x in losses[:: args.stride]],
        }
        print(f"{leg}: {losses.size} steps in {wall:.0f}s wall, "
              f"final-window loss {final:.6f}, nan_free={finite}")
        ok &= finite

    rel = abs(finals["bf16"] - finals["fp32"]) / max(abs(finals["fp32"]), 1e-12)
    record["final_rel_delta"] = round(rel, 5)
    record["rel_tol"] = args.rel_tol
    record["pass"] = bool(ok and rel <= args.rel_tol)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"final-window rel delta bf16 vs fp32: {rel:.4f} "
          f"(tol {args.rel_tol}) -> {'PASS' if record['pass'] else 'FAIL'}; "
          f"wrote {args.out}")
    if args.do_assert and not record["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
