#!/usr/bin/env python
"""SimMIM masked pre-training driver (reference pretrain.py).

Usage (reference-compatible: ``python pretrain.py`` runs the shipped config):

  python pretrain.py [--pretrain-config configs/pretrain_config.yaml]
                     [--config configs/config.yaml]
                     [--synthetic] [--epochs N] [--steps N] [--fp32]
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
    # bf16 compute (fp32 params) is the DEFAULT since round 4 — it is the
    # configuration every bench/BASELINE.md number measures; --fp32 restores
    # the reference's fp32-only training
    parser.add_argument("--fp32", action="store_true", help="fp32 compute "
                        "(default is bfloat16 compute, fp32 params)")
    parser.add_argument("--bf16", action="store_true",
                        help="(deprecated no-op: bf16 is the default; see --fp32)")
    parser.add_argument("--models-dir", default="models")
    parser.add_argument("--resume", default=None, help="checkpoint to resume from (full state)")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    # multi-host entry (SURVEY.md §5.8): join the jax.distributed cluster and
    # train on the GLOBAL mesh over every chip of the slice. On Cloud TPU the
    # coordinator/process id come from the TPU environment, so bare
    # --multihost suffices; elsewhere pass the three flags explicitly. Every
    # process runs this same driver; only process 0 writes checkpoints and
    # tracker rows (rank-gated in train/checkpoint.py + utils/tracking.py).
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed and train over the "
                        "global multi-process mesh")
    parser.add_argument("--coordinator", default=None,
                        help="coordinator address host:port (--multihost)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
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

    mesh = None
    if args.multihost:
        from maskedsst_tpu.parallel.mesh import initialize_multihost

        mh = {}
        if args.coordinator:
            mh["coordinator_address"] = args.coordinator
        if args.num_processes is not None:
            mh["num_processes"] = args.num_processes
        if args.process_id is not None:
            mh["process_id"] = args.process_id
        mesh = initialize_multihost(**mh)
        print(
            f"multihost: process {jax.process_index()}/{jax.process_count()}, "
            f"global mesh {dict(mesh.shape)}"
        )

    config = get_pretrain_config(args.pretrain_config, args.config, SEED)
    config.synthetic_tiles = args.synthetic_tiles
    dataset = get_dataset(config, supervised=False, synthetic=args.synthetic)

    trainer = Pretrainer(config, mesh=mesh, dtype=None if args.fp32 else jnp.bfloat16)
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
    if history["train_loss"]:
        # machine-parseable end-of-run marker (the multi-host harness
        # compares it across ranks and against a single-process control)
        print(f"FINAL train_loss={history['train_loss'][-1]:.10f}")


if __name__ == "__main__":
    main()
