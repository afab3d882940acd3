"""Finetune model factory (reference finetune.py:58-103): builds the model
named by ``config.method_name`` — "li" (DeepHyperX 3D-CNN baseline),
"ViTSpatialSpectral", or "ViTRGB" — plus the trainer flags that model needs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from maskedsst_tpu.config import Config
from maskedsst_tpu.models import ViTRGB, ViTSpatialSpectral
from maskedsst_tpu.models.zoo import get_model as zoo_get_model


def check_fused_mesh(fused: bool, mesh) -> None:
    """The Pallas fused path shards only over the ``data`` axis (the kernel
    is opaque to GSPMD's Megatron-style param partitioning); reject the
    silent-wrong combination of fused=True with a populated ``model`` axis."""
    if fused and mesh is not None and mesh.shape.get("model", 1) > 1:
        raise ValueError(
            "fused=True cannot be combined with a 'model' mesh axis > 1: the "
            "fused Pallas kernel supports data parallelism only. Use "
            "fused=False for tensor parallelism, or a pure data mesh."
        )


def build_finetune_model(
    config: Config, mesh=None, dtype=None
) -> Tuple[Any, Dict[str, Any]]:
    """Returns (model, trainer_kwargs) for Finetuner.

    trainer_kwargs carries: center_pixel, add_channel_dim, optimizer_override
    (the li SGD recipe unless ``overwrite_li_optim``), class_weights.
    ``mesh`` routes the fused kernels' explicit data-axis shard_map.
    ``dtype`` is the flax computation dtype for the ViT models (params stay
    fp32; bf16 halves the fused kernels' slab DMA — the same opt-in
    ``--bf16`` convention as pretrain.py; the li 3D-CNN ignores it, keeping
    the paper recipe in fp32).
    """
    name = config.method_name
    size = config.image_size - config.get("patch_sub", 0)

    if name == "li":
        model, opt, crit, hp = zoo_get_model(
            "li",
            n_classes=config.n_classes,
            n_bands=config.n_bands,
            ignored_labels=[config.ignored_label],
            patch_size=size,
        )
        trainer_kwargs: Dict[str, Any] = {
            "center_pixel": True,
            "add_channel_dim": True,
        }
        if not config.get("overwrite_li_optim", False):
            # keep the paper recipe (SGD momentum) + weighted CE
            # (finetune.py:132-138)
            trainer_kwargs["optimizer_override"] = opt
            trainer_kwargs["class_weights"] = crit["weight"]
        return model, trainer_kwargs

    if name == "ViTSpatialSpectral":
        from maskedsst_tpu.train.pretrainer import default_fused

        fused = config.get("fused")
        if fused is None:
            fused = default_fused()
        check_fused_mesh(fused, mesh)
        model = ViTSpatialSpectral(
            image_size=size,
            spatial_patch_size=config.patch_size,
            spectral_patch_size=config.band_patch_size,
            num_classes=config.n_classes,
            dim=config.transformer_dim,
            depth=config.transformer_depth,
            heads=config.transformer_n_heads,
            mlp_dim=config.transformer_mlp_dim,
            dropout=config.transformer_dropout,
            emb_dropout=config.transformer_emb_dropout,
            channels=config.n_bands,
            spectral_pos=config.get("spectral_pos"),
            spectral_pos_embed=config.spectral_pos_embed,
            blockwise_patch_embed=config.blockwise_patch_embed,
            spectral_only=config.spectral_only,
            pixelwise=config.pixelwise,
            pos_embed_len=config.get("pos_embed_len"),
            fused=fused,
            mesh=mesh if fused else None,
            dtype=dtype,
        )
        return model, {"center_pixel": bool(config.pixelwise)}

    if name == "ViTRGB":
        model = ViTRGB(
            image_size=config.image_size,
            patch_size=config.patch_size,
            num_classes=config.n_classes,
            dim=config.transformer_dim,
            depth=config.transformer_depth,
            heads=config.transformer_n_heads,
            mlp_dim=config.transformer_mlp_dim,
            dropout=config.transformer_dropout,
            emb_dropout=config.transformer_emb_dropout,
            channels=config.n_bands,
            pixelwise=True,  # one prediction per pixel (finetune.py:98)
            dtype=dtype,
        )
        return model, {}

    raise NotImplementedError(f"method {name} not available")


def load_pretrained_params(path: str, config: Config, model, seed: int = 5):
    """Load encoder weights from a pretrain checkpoint (.msgpack or .pth)
    into a fresh param tree for ``model``, applying the reference's head
    surgery (fresh classification head, pos_embed truncation under
    patch_sub; src/utils.py:276-313). Returns None when ``path`` does not
    exist. Shared by finetune.py and finetune_sweep.py — the reference sweep
    driver loads checkpoint_path the same way (src/finetune_sweep.py:99-100).
    """
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    if not os.path.exists(path):
        return None

    size = config.image_size - config.get("patch_sub", 0)
    if config.method_name == "li":
        # the li 3-D CNN takes torch NCDHW [B, 1, C, H, W] (utils.py:637-638)
        shape = (1, 1, config.n_bands, size, size)
    else:
        shape = (1, config.n_bands, size, size)
    fresh = jax.jit(
        lambda k, v: model.init(k, v, deterministic=True)
    )(jax.random.PRNGKey(seed), jnp.zeros(shape, jnp.float32))["params"]

    if path.endswith(".pth"):
        from maskedsst_tpu.io.torch_import import (
            load_pretrained_encoder,
            load_torch_checkpoint,
        )

        ckpt = load_torch_checkpoint(path)
        return load_pretrained_encoder(
            ckpt, model, fresh, patch_sub=config.get("patch_sub", 0)
        )

    # framework checkpoint: full SimMIM train state → encoder subtree
    from flax import serialization

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = raw.get("params", raw)
    enc = params.get("encoder", params)
    merged = dict(fresh)
    for key, val in enc.items():
        if key == "head_linear":
            continue  # fresh classification head (reference head surgery)
        if key not in fresh:
            print(f"[finetune] skipping checkpoint key {key!r} absent from model")
            continue
        if key == "pos_embed" and config.get("patch_sub", 0):
            want = (config.image_size - config.patch_sub) ** 2
            val = np.asarray(val)
            # the reference asserts this before truncating
            # (src/utils.py:303-308); without it a checkpoint pretrained at
            # a SMALLER image_size makes the slice a silent no-op and the
            # wrong-shaped table only fails much later inside apply
            assert val.shape[1] >= want, (
                f"checkpoint pos_embed has {val.shape[1]} positions < the "
                f"{want} this finetune geometry needs (image_size "
                f"{config.image_size} - patch_sub {config.patch_sub}); the "
                "checkpoint was pretrained at a smaller image_size"
            )
            val = val[:, :want, :]
        merged[key] = val
    return serialization.from_state_dict(fresh, merged)
