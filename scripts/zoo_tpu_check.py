#!/usr/bin/env python
"""One real-TPU train step for every DeepHyperX zoo net (VERDICT r3 #3).

Round 3 proved CPU-green != TPU-green (the Mosaic odd-seq slab crash was
invisible to CPU interpret). The zoo (models/zoo.py, mirroring
/root/reference/DeepHyperX/models.py:205-996) is pure XLA — conv_general_
dilated, BatchNorm, LRN, GRU — so the risk class is lower than Pallas, but
"implemented" for a TPU-native framework includes actually executing each
net on the chip. This script runs, per net, at its paper input geometry and
factory-default batch size:

    init → forward+backward+optimizer update (HyperXTrainer._train_step,
    the jitted body hyperx/main.py trains with) → a second step → an eval
    forward

asserting a finite, changing loss. Per-net wall ms/step is recorded for
the round record (NOTE: single-dispatch steps through the dev tunnel carry
a fixed ~27 ms host round trip — the column is a TPU-executes-sanely
record, not a kernel benchmark; device-level numbers live in
scripts/kernel_tune.py and bench.py).

Usage: python scripts/zoo_tpu_check.py [--names li,hu,...] [--json-out ZOO_TPU_CHECK.json]
"""

import argparse
import json
import os
import statistics
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLASSES = 20

# paper band counts (chen's spectral pyramid needs >= 94 bands —
# tests/test_zoo.py PARITY_CASES uses the same geometries)
N_BANDS = {"chen": 100}
DEFAULT_BANDS = 50

ALL_NAMES = [
    "nn", "hu", "hamida", "lee", "chen", "li", "he", "luo", "sharma",
    "liu", "boulch", "mou",
]


def check_net(name: str, steps: int = 4, device_time: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskedsst_tpu.hyperx.training import HyperXTrainer
    from maskedsst_tpu.models.zoo import get_model

    n_bands = N_BANDS.get(name, DEFAULT_BANDS)
    model, opt, crit, hp = get_model(
        name, n_classes=N_CLASSES, n_bands=n_bands, ignored_labels=[-1]
    )
    t0 = time.perf_counter()
    trainer = HyperXTrainer(model, opt, crit, hp)
    init_s = time.perf_counter() - t0

    p = hp["patch_size"]
    bs = hp["batch_size"]
    rng = np.random.default_rng(0)
    shape = (bs, n_bands) if p == 1 else (bs, 1, n_bands, p, p)
    img = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    # dense nets (lee: center_pixel=False, per-pixel logits) train against
    # full label patches; everything else against the center-pixel label
    lshape = (bs,) if hp["center_pixel"] or p == 1 else (bs, p, p)
    # integers() upper bound is exclusive: N_CLASSES (not N_CLASSES-1) so the
    # top class is drawn and its logit column's loss/grad path is exercised
    label = jnp.asarray(rng.integers(0, N_CLASSES, lshape), jnp.int32)

    params, stats, opt_state = trainer.params, trainer.batch_stats, trainer.opt_state
    losses, times = [], []
    for i in range(steps):
        key = jax.random.PRNGKey(i)
        t0 = time.perf_counter()
        params, stats, opt_state, loss = trainer._train_step(
            params, stats, opt_state, img, label, key
        )
        losses.append(float(loss))  # host fetch forces completion
        times.append(time.perf_counter() - t0)

    logits = trainer._predict(params, stats, img)
    logits_np = np.asarray(logits)

    assert all(np.isfinite(l) for l in losses), f"{name}: non-finite loss {losses}"
    assert np.isfinite(logits_np).all(), f"{name}: non-finite eval logits"
    # the update must DO something: two optimizer steps from a cold init
    # always move the loss at these recipes' learning rates
    assert losses[-1] != losses[0], f"{name}: loss frozen across steps {losses}"

    row = {
        "name": name,
        "ok": True,
        "loss_first": round(losses[0], 5),
        "loss_last": round(losses[-1], 5),
        "wall_ms_per_step": round(1e3 * statistics.median(times[1:]), 1),
        "compile_plus_step_ms": round(1e3 * times[0], 1),
        "init_s": round(init_s, 1),
        "batch": bs,
        "geometry": list(shape),
    }
    if device_time:
        # DEVICE ms/step (VERDICT r4 #5): the wall column above is
        # tunnel-RTT-bound (~27 ms floor/dispatch) and explicitly not a
        # kernel number; this one is. 8 traced steps of the already-compiled
        # program; accounting + guards shared via
        # utils.profiling.traced_busy_ms (busy time — dispatch gaps between
        # the single-step programs don't inflate it).
        from maskedsst_tpu.utils.profiling import traced_busy_ms

        k = 8

        def steps_fn(params=params, stats=stats, opt_state=opt_state):
            loss = None
            for i in range(k):
                params, stats, opt_state, loss = trainer._train_step(
                    params, stats, opt_state, img, label, jax.random.PRNGKey(100 + i)
                )
            _ = float(loss)  # one sync at the end

        busy = traced_busy_ms(f"/tmp/zoo_trace_{name}", steps_fn)
        if busy is not None:
            row["device_ms_per_step"] = round(busy / k, 3)
        else:
            row["device_ms_per_step"] = None
            print(f"{name}: device trace failed/overcounted — no device time",
                  file=sys.stderr)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=",".join(ALL_NAMES))
    # minimum 2: the loss-must-move assert and the warmup-excluded timing
    # median both need a second step
    ap.add_argument("--steps", type=int, default=4,
                    help="train steps per net (min 2)")
    ap.add_argument("--json-out", default="ZOO_TPU_CHECK.json")
    ap.add_argument(
        "--device-time", default="li,hamida,lee",
        help="comma list of nets (or 'all'/'none') that additionally record "
        "DEVICE ms/step from an 8-step jax.profiler trace; li is the "
        "flagship finetune baseline (reference finetune.py:58-65)",
    )
    args = ap.parse_args()
    if args.steps < 2:
        ap.error("--steps must be >= 2 (loss-movement assert and "
                 "warmup-excluded timing both need a second step)")

    from maskedsst_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    platform = jax.devices()[0].platform
    names = args.names.split(",")
    dt = args.device_time
    dt_names = set() if dt == "none" else set(names) if dt == "all" else set(dt.split(","))
    unknown = dt_names - set(names)
    if unknown:
        # fail FAST: a typo'd net name would otherwise be discovered only
        # after the slow on-chip run completes, with the column missing
        ap.error(f"--device-time names not in --names: {sorted(unknown)}")
    rows, ok = [], True
    for name in names:
        try:
            row = check_net(name, steps=args.steps, device_time=name in dt_names)
        except Exception as exc:  # noqa: BLE001 — record and keep going
            traceback.print_exc()
            row = {"name": name, "ok": False, "error": str(exc).splitlines()[0][:200]}
            ok = False
        rows.append(row)
        print(json.dumps(row), flush=True)

    record = {
        "metric": "zoo_tpu_check",
        "platform": platform,
        "ok": ok,
        "nets_ok": sum(1 for r in rows if r["ok"]),
        "nets_total": len(rows),
        "per_net": rows,
    }
    if args.json_out and args.json_out != "none":
        with open(args.json_out, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
    print(f"zoo_tpu_check: {record['nets_ok']}/{record['nets_total']} ok on {platform}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
