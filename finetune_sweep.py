#!/usr/bin/env python
"""Hyperparameter-sweep finetune driver (reference src/finetune_sweep.py).

Configuration comes from the sweep controller (wandb when available) layered
over the finetune YAML defaults, with the reference's string→bool coercion
(verify_sweep_params). Run standalone with ``--set key=value`` overrides for
a controller-free sweep step:

  python finetune_sweep.py [dataset] --set lr=0.001 --set linear_eval=false
"""

import argparse
import random

import numpy as np
import yaml

SEED = 5


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset", nargs="?", default="enmap", choices=["enmap", "houston2018"])
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--cpu", action="store_true")
    # bf16 compute is the default since round 4 (see finetune.py); --fp32
    # restores the reference's fp32-only training
    parser.add_argument(
        "--fp32", action="store_true", help="fp32 compute (default is "
        "bfloat16 compute, fp32 params)"
    )
    parser.add_argument(
        "--bf16", action="store_true",
        help="(deprecated no-op: bf16 compute is the default; see --fp32)"
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from maskedsst_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    random.seed(SEED)
    np.random.seed(SEED)

    from maskedsst_tpu.config import (
        Config,
        get_finetune_config,
        rederive_finetune_config,
        verify_sweep_params,
    )
    from maskedsst_tpu.data.pipeline import split_dataset
    from maskedsst_tpu.data.resolve import get_dataset
    from maskedsst_tpu.train.factory import build_finetune_model
    from maskedsst_tpu.train.finetuner import Finetuner
    from maskedsst_tpu.utils.tracking import Tracker

    config = get_finetune_config(
        f"configs/finetune_config_{args.dataset}.yaml", args.config, SEED
    )

    # layer sweep values: wandb.config when a sweep agent is driving,
    # otherwise --set overrides (reference get_sweep_finetune_config,
    # src/utils.py:367-412)
    overrides = {}
    tracker = Tracker("enmap-simmim-downstream", config)
    if tracker._wandb is not None:
        overrides.update(dict(tracker._wandb.config))
    for kv in args.set:
        key, _, val = kv.partition("=")
        overrides[key] = yaml.safe_load(val)
    for key, val in overrides.items():
        setattr(config, key, val)

    coerced = verify_sweep_params(config.to_dict())
    for key, val in coerced.items():
        setattr(config, key, val)
    # re-derive spectral_pos/patch_sub AFTER the overrides, like the
    # reference sweep config does (src/utils.py:381-388) — sweeping
    # band_patch_size/pixelwise must not leave stale derived fields
    rederive_finetune_config(config)
    config.run_id = tracker.run_id

    from maskedsst_tpu.parallel.mesh import get_mesh
    from maskedsst_tpu.train.factory import load_pretrained_params

    import jax.numpy as jnp

    mesh = get_mesh()
    model, trainer_kwargs = build_finetune_model(
        config, mesh=mesh, dtype=None if args.fp32 else jnp.bfloat16
    )

    # load the pretrained encoder like the reference sweep driver does
    # (src/finetune_sweep.py:99-100); checkpoint_path may have been coerced
    # to None ("none"/"None") by verify_sweep_params
    params = None
    ckpt_path = config.get("checkpoint_path")
    if ckpt_path:
        params = load_pretrained_params(ckpt_path, config, model, seed=SEED)
        if params is None:
            print(f"[sweep] checkpoint {ckpt_path!r} not found — training from scratch")

    dataset = get_dataset(config, supervised=True, synthetic=args.synthetic)
    val_ds, train_ds = split_dataset(dataset, config.train_fraction, config.data_fraction, SEED)

    trainer = Finetuner(config, model, params=params, mesh=mesh, **trainer_kwargs)
    history = trainer.fit(
        train_ds, val_ds, tracker=tracker, epochs=args.epochs, max_steps=args.steps
    )
    tracker.finish()
    print(f"best val acc: {history['best_val_acc']:.4f}")


if __name__ == "__main__":
    main()
