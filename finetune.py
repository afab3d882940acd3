#!/usr/bin/env python
"""Supervised finetuning driver (reference finetune.py).

Usage (reference-compatible positional dataset name):

  python finetune.py {enmap|houston2018} [--synthetic] [--epochs N]
                     [--steps N] [--checkpoint PATH|none] [--cpu] [--fp32]

The model comes from ``method_name`` in the finetune config (li /
ViTSpatialSpectral / ViTRGB). ``--checkpoint`` overrides the config's
``checkpoint_path``; both ``.msgpack`` (this framework) and ``.pth``
(reference PyTorch) checkpoints are accepted, with the reference's
encoder-prefix/head surgery applied (src/utils.py:276-313).
"""

import argparse
import random

import numpy as np

SEED = 5


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset", choices=["enmap", "houston2018"])
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--synthetic-tiles", type=int, default=512)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--checkpoint", default=None, help="'none' disables loading")
    parser.add_argument(
        "--resume", default=None, metavar="CKPT",
        help="resume an interrupted finetune from a full-state .msgpack "
        "checkpoint this driver wrote (restores params, optimizer moments, "
        "step/epoch counters, plateau-scheduler state, best_val_acc; the "
        "loader fast-forwards to the exact next batch). Mutually exclusive "
        "with --checkpoint, which imports pretrained ENCODER weights only.",
    )
    parser.add_argument("--models-dir", default="models")
    parser.add_argument("--cpu", action="store_true")
    # bf16 compute (fp32 params) is the DEFAULT since round 4: +12% train
    # throughput (BASELINE.md finetune bs-64 34.98 → 31.08 ms device step)
    # with accuracy pinned vs fp32 (tests/test_pipeline.py bf16 legs). The
    # reference trains fp32-only; --fp32 restores that exactly.
    parser.add_argument(
        "--fp32", action="store_true", help="fp32 compute (the pre-round-4 "
        "and reference behavior; default is bfloat16 compute, fp32 params)"
    )
    parser.add_argument(
        "--bf16", action="store_true",
        help="(deprecated no-op: bf16 compute is the default; see --fp32)"
    )
    # multi-host entry — see pretrain.py (same contract: every process runs
    # this driver; rank 0 alone persists)
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed and train over the "
                        "global multi-process mesh")
    parser.add_argument("--coordinator", default=None,
                        help="coordinator address host:port (--multihost)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()
    if args.resume and args.checkpoint not in (None, "none"):
        parser.error(
            "--resume and --checkpoint are mutually exclusive: --resume "
            "restores the FULL finetune state (params included); loading "
            "pretrained encoder weights on top would overwrite it"
        )

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from maskedsst_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    random.seed(SEED)
    np.random.seed(SEED)

    from maskedsst_tpu.config import get_finetune_config
    from maskedsst_tpu.data.pipeline import split_dataset
    from maskedsst_tpu.data.resolve import get_dataset
    from maskedsst_tpu.train.factory import build_finetune_model
    from maskedsst_tpu.train.finetuner import Finetuner
    from maskedsst_tpu.utils.tracking import Tracker

    config = get_finetune_config(
        f"configs/finetune_config_{args.dataset}.yaml", args.config, SEED
    )
    config.synthetic_tiles = args.synthetic_tiles
    if args.checkpoint is not None:
        config.checkpoint_path = None if args.checkpoint == "none" else args.checkpoint

    from maskedsst_tpu.parallel.mesh import get_mesh

    import jax.numpy as jnp

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
    else:
        mesh = get_mesh()
    model, trainer_kwargs = build_finetune_model(
        config, mesh=mesh, dtype=None if args.fp32 else jnp.bfloat16
    )

    params = None
    ckpt_path = config.get("checkpoint_path")
    if args.resume:
        # a full-state resume restores params itself — loading pretrained
        # encoder weights on top would silently overwrite the trained state.
        # An explicit --checkpoint alongside --resume is a contradiction the
        # parser already rejected above; the config's checkpoint_path is
        # simply superseded.
        ckpt_path = None
    if ckpt_path:
        params = _load_pretrained(ckpt_path, config, model)
        if params is None:
            print(f"[finetune] checkpoint {ckpt_path!r} not found — training from scratch")

    dataset = get_dataset(config, supervised=True, synthetic=args.synthetic)
    val_ds, train_ds = split_dataset(
        dataset, config.train_fraction, config.data_fraction, SEED
    )
    print(f"devices: {jax.devices()}")
    print(f"len(train_dataset)={len(train_ds)}")
    print(f"len(val_dataset)={len(val_ds)}")

    trainer = Finetuner(config, model, params=params, mesh=mesh, **trainer_kwargs)
    print(f"Model name: {config.method_name}")
    print(f"Model parameters: {trainer.num_params:,}")
    if args.resume:
        step = trainer.resume(args.resume)
        print(f"resumed from {args.resume} at step {step}")

    tracker = Tracker("downstream", config)
    history = trainer.fit(
        train_ds,
        val_ds,
        tracker=tracker,
        models_dir=args.models_dir,
        epochs=args.epochs,
        max_steps=args.steps,
    )
    tracker.finish()
    print(f"best val acc: {history['best_val_acc']:.4f}")
    if history["throughput"]:
        print("throughput:", {k: round(v, 2) for k, v in history["throughput"].items()})
    if history["train"]:
        # machine-parseable end-of-run marker (the multi-host harness
        # compares it across ranks and against a single-process control)
        print(
            f"FINAL train_loss={history['train'][-1]['loss']:.10f} "
            f"best_val_acc={history['best_val_acc']:.10f}"
        )


def _load_pretrained(path: str, config, model):
    """Load encoder weights from a pretrain checkpoint (.msgpack or .pth)."""
    from maskedsst_tpu.train.factory import load_pretrained_params

    return load_pretrained_params(path, config, model, seed=SEED)


if __name__ == "__main__":
    main()
