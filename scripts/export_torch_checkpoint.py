#!/usr/bin/env python
"""Export a maskedsst_tpu checkpoint to a reference-loadable ``.pth``.

The inverse of the import path: a ViTSpatialSpectral parameter tree (from a
full-state or params-only .msgpack checkpoint) is rewritten to the
reference's state-dict keys (src/vit_spatial_spectral.py module layout) and
saved with ``torch.save({"model_state_dict": ...})`` so the upstream PyTorch
code can ``load_state_dict`` it directly.

  python scripts/export_torch_checkpoint.py --dataset enmap \
      --checkpoint run/best.msgpack --out exported.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="enmap", choices=["enmap", "houston2018"])
    ap.add_argument("--config", default="configs/config.yaml")
    ap.add_argument("--checkpoint", required=True, help=".msgpack checkpoint")
    ap.add_argument("--out", required=True, help="output .pth path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from maskedsst_tpu.config import get_finetune_config
    from maskedsst_tpu.io.torch_import import export_vit_spatial_spectral
    from maskedsst_tpu.train.checkpoint import restore_params
    from maskedsst_tpu.train.factory import build_finetune_model

    config = get_finetune_config(
        f"configs/finetune_config_{args.dataset}.yaml", args.config
    )
    model, _ = build_finetune_model(config)
    size = config.image_size - config.get("patch_sub", 0)
    template = jax.jit(lambda k, v: model.init(k, v, deterministic=True))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, config.n_bands, size, size), jnp.float32),
    )["params"]
    params = restore_params(args.checkpoint, template)

    sd = export_vit_spatial_spectral(params, model)
    state_dict = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    torch.save(
        {"model_state_dict": state_dict, "config": dict(config.to_dict())},
        args.out,
    )
    print(f"wrote {args.out} ({len(state_dict)} tensors)")


if __name__ == "__main__":
    main()
