#!/usr/bin/env python
"""SimMIM masked pre-training driver (reference pretrain.py).

Usage (reference-compatible: ``python pretrain.py`` runs the shipped config):

  python pretrain.py [--pretrain-config configs/pretrain_config.yaml]
                     [--config configs/config.yaml]
                     [--synthetic] [--epochs N] [--steps N] [--bf16]
"""

import argparse
import random

import numpy as np

SEED = 5


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pretrain-config", default="configs/pretrain_config.yaml")
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--synthetic-tiles", type=int, default=512)
    parser.add_argument("--synthetic", action="store_true", help="train on synthetic cubes")
    parser.add_argument("--epochs", type=int, default=None, help="override config.epoch")
    parser.add_argument("--steps", type=int, default=None, help="stop after N steps")
    parser.add_argument("--bf16", action="store_true", help="bfloat16 compute (fp32 params)")
    parser.add_argument("--models-dir", default="models")
    parser.add_argument("--resume", default=None, help="checkpoint to resume from (full state)")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from maskedsst_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    random.seed(SEED)
    np.random.seed(SEED)

    from maskedsst_tpu.config import get_pretrain_config
    from maskedsst_tpu.data.resolve import get_dataset
    from maskedsst_tpu.train.pretrainer import Pretrainer
    from maskedsst_tpu.utils.tracking import Tracker

    config = get_pretrain_config(args.pretrain_config, args.config, SEED)
    config.synthetic_tiles = args.synthetic_tiles
    dataset = get_dataset(config, supervised=False, synthetic=args.synthetic)

    trainer = Pretrainer(config, dtype=jnp.bfloat16 if args.bf16 else None)
    print(f"devices: {jax.devices()}")
    print(f"model parameters: {trainer.num_params:,}")
    if args.resume:
        step = trainer.resume(args.resume)
        print(f"resumed from {args.resume} at step {step}")

    tracker = Tracker("enmap-mim-spatial-spectral", config)
    history = trainer.fit(
        dataset,
        epochs=args.epochs,
        max_steps=args.steps,
        tracker=tracker,
        models_dir=args.models_dir,
    )
    tracker.finish()
    if history["throughput"]:
        print("throughput:", {k: round(v, 2) for k, v in history["throughput"].items()})


if __name__ == "__main__":
    main()
