"""Standalone predictor: load a checkpoint, run sliding-window inference over
a scene, write probability arrays plus raw and color-palette prediction maps
(reference DeepHyperX/inference.py:16-163): ``probs.npy``,
``prediction.npy``, ``prediction.tif`` (uint8 label raster) and
``color_prediction.tif`` (hls-palette RGB, inference.py:133-139,158-163).

  python -m maskedsst_tpu.hyperx.inference --model li --checkpoint ck.msgpack \
      --image scene.mat --mat-key indian_pines_corrected [--n-classes N]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--image", required=True, help=".mat/.tif/.hdr scene or .npy array [H,W,B]")
    parser.add_argument("--mat-key", default=None)
    parser.add_argument("--n-classes", type=int, required=True)
    parser.add_argument("--patch-size", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=100)
    parser.add_argument("--test-stride", type=int, default=1)
    parser.add_argument("--out", default="inference_out")
    args = parser.parse_args()

    if args.image.endswith(".npy"):
        img = np.load(args.image)
    else:
        from maskedsst_tpu.hyperx.datasets import open_file

        img = open_file(args.image)
        if isinstance(img, dict):
            if not args.mat_key:
                parser.error("--mat-key is required for .mat scenes")
            img = img[args.mat_key]
    img = np.asarray(img, dtype=np.float32)
    # match the training pipeline: zero NaNs BEFORE min-max normalization
    # (datasets.get_dataset does the same; raw NaNs would poison min/max and
    # turn the whole scene NaN), and guard constant scenes
    nan_mask = np.isnan(img)
    if nan_mask.any():
        print(
            f"warning: {int(nan_mask.sum())} NaN values in the scene; zeroed "
            "like the training pipeline"
        )
        img[nan_mask] = 0.0
    span = img.max() - img.min()
    img = (img - img.min()) / (span if span > 0 else 1.0)

    from maskedsst_tpu.hyperx.training import HyperXTrainer
    from maskedsst_tpu.models.zoo import get_model

    overrides = {"test_stride": args.test_stride, "batch_size": args.batch_size}
    if args.patch_size:
        overrides["patch_size"] = args.patch_size
    model, opt, crit, hp = get_model(
        args.model,
        n_classes=args.n_classes,
        n_bands=img.shape[-1],
        ignored_labels=[0],
        **overrides,
    )
    trainer = HyperXTrainer(model, opt, crit, hp)
    trainer.restore(args.checkpoint)  # params + BN running stats

    probs = trainer.test(img, batch_size=args.batch_size)
    prediction = np.argmax(probs, axis=-1)

    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "probs.npy"), probs)
    np.save(os.path.join(args.out, "prediction.npy"), prediction)

    # raw + color prediction rasters (reference inference.py:133-139,158-163:
    # palette colors 1..n from the hls wheel, 0 black)
    from maskedsst_tpu.hyperx.viz import generate_palette, save_prediction_maps

    palette = generate_palette(args.n_classes + 1)
    maps = save_prediction_maps(args.out, "prediction", prediction, palette)
    print(
        f"wrote {args.out}/probs.npy, prediction.npy and "
        f"{', '.join(os.path.basename(p) for p in maps)}, shape {prediction.shape}"
    )


if __name__ == "__main__":
    main()
