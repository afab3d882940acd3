#!/usr/bin/env python
"""Checkpoint-fidelity inference demo (reference inference_example.ipynb,
SURVEY.md §3.5 — the logits-parity path).

Builds ViTSpatialSpectral from the finetune config, loads a finetuned
checkpoint (.msgpack from this framework or a reference .pth), runs
sliding-window predictions over 64x64 tiles and reports accuracy; optionally
writes RGB/label/prediction PNGs.

  python inference_example.py [--dataset enmap] [--checkpoint PATH]
      [--synthetic] [--tiles N] [--plots out/]
"""

import argparse

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="enmap", choices=["enmap", "houston2018"])
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--tiles", type=int, default=8)
    parser.add_argument("--plots", default=None, help="directory for PNG renders")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from maskedsst_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from maskedsst_tpu.config import get_finetune_config
    from maskedsst_tpu.data.resolve import get_dataset
    from maskedsst_tpu.train.factory import build_finetune_model

    config = get_finetune_config(
        f"configs/finetune_config_{args.dataset}.yaml", args.config
    )
    if args.checkpoint is not None:
        config.checkpoint_path = args.checkpoint
    config.synthetic_tiles = max(args.tiles, 1)

    model, _ = build_finetune_model(config)
    size = config.image_size - config.get("patch_sub", 0)

    # params: from checkpoint when present, else fresh (shape demo)
    import finetune as finetune_driver

    params = None
    if config.get("checkpoint_path"):
        params = finetune_driver._load_pretrained(config.checkpoint_path, config, model)
    if params is None:
        print("no checkpoint found — using fresh weights (geometry demo only)")
        # jit the init: eager flax init pays ~1 min of per-op dispatch on
        # tunneled backends (CLAUDE.md)
        params = jax.jit(lambda k, v: model.init(k, v, deterministic=True))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, config.n_bands, size, size), jnp.float32),
        )["params"]

    dataset = get_dataset(config, supervised=True, synthetic=args.synthetic)

    predict = jax.jit(
        lambda p, x: jnp.argmax(model.apply({"params": p}, x, deterministic=True), axis=1)
    )

    # window-style supervised datasets (houston2018 with pixelwise: True)
    # yield samples that ARE windows — img [C, s, s] with a SCALAR
    # center-pixel label — so there is nothing to slide over; batch the
    # windows straight through the classifier instead
    if np.asarray(dataset[0]["label"]).ndim == 0:
        n = min(max(args.tiles, 1) * 64, len(dataset))
        imgs = np.stack([np.asarray(dataset[i]["img"]) for i in range(n)])
        labels = np.asarray([dataset[i]["label"] for i in range(n)])
        preds = np.asarray(predict(params, jnp.asarray(imgs)))
        if preds.ndim > 1:  # per-pixel head: score the center pixel
            preds = preds[:, preds.shape[1] // 2, preds.shape[2] // 2]
        valid = labels != config.ignored_label
        acc = float((preds[valid] == labels[valid]).mean()) if valid.any() else float("nan")
        print(f"accuracy over {n} center-labeled windows: {acc:.4f}")
        return

    accs = []
    rendered = 0
    for idx in range(min(args.tiles, len(dataset))):
        sample = dataset[idx]
        img = np.asarray(sample["img"])  # [C, 64, 64]
        label = np.asarray(sample["label"])  # [64, 64]
        tile = img.shape[-1]
        k = tile // size
        pred_map = np.full_like(label, -1)
        # sliding window with stride == window (notebook cells 11-13) — all
        # k*k windows in ONE dispatch: per-window dispatches pay the fixed
        # ~27 ms host↔device round trip each (CLAUDE.md)
        xys = [(x, y) for x in range(0, k * size, size) for y in range(0, k * size, size)]
        windows = np.stack([img[:, x : x + size, y : y + size] for x, y in xys])
        preds = np.asarray(predict(params, jnp.asarray(windows)))
        for (x, y), pred in zip(xys, preds):
            if pred.ndim == 0:
                # pixelwise head: one class per window → its center pixel
                pred_map[x + size // 2, y + size // 2] = pred
            else:
                pred_map[x : x + size, y : y + size] = pred
        # score only covered pixels (patch_sub shrinks the window so the
        # last row/col of the tile — and, pixelwise, all non-center pixels
        # — are never predicted; counting them would deflate accuracy)
        valid = (label != config.ignored_label) & (pred_map >= 0)
        acc = float((pred_map[valid] == label[valid]).mean()) if valid.any() else float("nan")
        accs.append(acc)
        print(f"tile {idx}: accuracy {acc:.4f}")

        if args.plots and rendered < 4:
            _render(args.plots, idx, img, label, pred_map)
            rendered += 1

    print(f"mean tile accuracy over {len(accs)} tiles: {np.nanmean(accs):.4f}")


def _render(outdir: str, idx: int, img, label, pred) -> None:
    import os

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping plots")
        return
    os.makedirs(outdir, exist_ok=True)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    rgb = img[[min(len(img) - 1, 43), min(len(img) - 1, 21), 0]].transpose(1, 2, 0)
    rgb = (rgb - rgb.min()) / (rgb.max() - rgb.min() + 1e-9)
    axes[0].imshow(rgb)
    axes[0].set_title("RGB")
    axes[1].imshow(label, interpolation="nearest")
    axes[1].set_title("label")
    axes[2].imshow(pred, interpolation="nearest")
    axes[2].set_title("prediction")
    for ax in axes:
        ax.axis("off")
    fig.savefig(os.path.join(outdir, f"tile{idx}.png"), dpi=100, bbox_inches="tight")
    plt.close(fig)


if __name__ == "__main__":
    main()
