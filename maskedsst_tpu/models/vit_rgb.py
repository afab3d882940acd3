"""ViTRGB — vanilla (lucidrains-style) ViT with an optional per-pixel head.

Reference: src/vit_original.py:103-202. Differences from ViTSpatialSpectral:
patch vectors are ordered ``(p1 p2 c)`` (channel minor), a cls token is
prepended (and dropped again before the head — the reference keeps it only so
the learned positional table has ``num_patches+1`` rows), and there is a
single joint transformer over the spatial patch grid.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from maskedsst_tpu.models.layers import LN_EPS, Transformer
from maskedsst_tpu.models.vit_spatial_spectral import _pair, _unfold_pixel_logits


class ViTRGB(nn.Module):
    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    pixelwise: bool = False
    dtype: Optional[jnp.dtype] = None

    @property
    def patch_height(self) -> int:
        return _pair(self.patch_size)[0]

    @property
    def patch_width(self) -> int:
        return _pair(self.patch_size)[1]

    @property
    def num_patches_height(self) -> int:
        return _pair(self.image_size)[0] // self.patch_height

    @property
    def num_patches_width(self) -> int:
        return _pair(self.image_size)[1] // self.patch_width

    @property
    def num_patches(self) -> int:
        return self.num_patches_height * self.num_patches_width

    def to_patch(self, img: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H, W] → [B, n, p1*p2*C] with channel-minor patch vectors
        (reference Rearrange ``b c (h p1) (w p2) -> b (h w) (p1 p2 c)``)."""
        b, c, hh, ww = img.shape
        p1, p2 = self.patch_height, self.patch_width
        h, w = hh // p1, ww // p2
        x = img.reshape(b, c, h, p1, w, p2)
        x = x.transpose(0, 2, 4, 3, 5, 1)  # b h w p1 p2 c
        return x.reshape(b, h * w, p1 * p2 * c)

    @nn.compact
    def __call__(self, img: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        img_h, img_w = _pair(self.image_size)
        assert img_h % self.patch_height == 0 and img_w % self.patch_width == 0

        x = self.to_patch(img)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="patch_pre_norm")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="patch_post_norm")(x)

        b, n, _ = x.shape
        cls_token = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, self.num_patches + 1, self.dim)
        )
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (b, 1, self.dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_embedding[:, : n + 1].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        x = Transformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            dtype=self.dtype,
            name="transformer",
        )(x, deterministic=deterministic)

        x = x[:, 1:, :]  # drop cls (reference src/vit_original.py:193)
        x = x.reshape(b, self.num_patches_height, self.num_patches_width, self.dim)

        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="head_norm")(x)
        if self.pixelwise:
            x = nn.Dense(
                self.num_classes * self.patch_height * self.patch_width,
                dtype=self.dtype,
                name="head_linear",
            )(x)
            return _unfold_pixel_logits(x, self.patch_height, self.patch_width, self.num_classes)
        # non-pixelwise head still runs per patch token (reference :163,181-202)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head_linear")(x)
