"""Finetune model factory (reference finetune.py:58-103): builds the model
named by ``config.method_name`` — "li" (DeepHyperX 3D-CNN baseline),
"ViTSpatialSpectral", or "ViTRGB" — plus the trainer flags that model needs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from maskedsst_tpu.config import Config
from maskedsst_tpu.models import ViTRGB, ViTSpatialSpectral
from maskedsst_tpu.models.zoo import get_model as zoo_get_model


def build_finetune_model(config: Config) -> Tuple[Any, Dict[str, Any]]:
    """Returns (model, trainer_kwargs) for Finetuner.

    trainer_kwargs carries: center_pixel, add_channel_dim, optimizer_override
    (the li SGD recipe unless ``overwrite_li_optim``), class_weights.
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
        )
        return model, {}

    raise NotImplementedError(f"method {name} not available")
