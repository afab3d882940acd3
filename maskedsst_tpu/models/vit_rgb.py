"""ViTRGB — vanilla (lucidrains-style) ViT with an optional per-pixel head.

Reference: src/vit_original.py:103-202. Differences from ViTSpatialSpectral:
patch vectors are ordered ``(p1 p2 c)`` (channel minor), a cls token is
prepended (and dropped again before the head — the reference keeps it only so
the learned positional table has ``num_patches+1`` rows), and there is a
single joint transformer over the spatial patch grid.

Sub-entry points (``to_patch``/``embed``/``encode``) exist for the legacy
SimMIM wrapper (reference vit_simmim_original.py:43-136), which masks patch
tokens without the cls token.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from maskedsst_tpu.models.layers import LN_EPS, Transformer
from maskedsst_tpu.models.vit_spatial_spectral import _pair, _unfold_pixel_logits


class _PatchChain(nn.Module):
    """LN(patch_dim) → Linear(dim) → LN(dim) (reference Sequential stages)."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, patches):
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="patch_pre_norm")(patches)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="patch_post_norm")(x)


class ViTOriginal(nn.Module):
    """Classic cls/mean-pooled ViT classifier → [B, num_classes]
    (reference ViT_original, src/vit_spatial_spectral.py:107-175; unused by
    the reference drivers but part of its public surface)."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, img: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        assert self.pool in ("cls", "mean")
        p1, p2 = _pair(self.patch_size)
        b, c, hh, ww = img.shape
        h, w = hh // p1, ww // p2
        x = img.reshape(b, c, h, p1, w, p2).transpose(0, 2, 4, 3, 5, 1)
        x = x.reshape(b, h * w, p1 * p2 * c)
        x = _PatchChain(dim=self.dim, dtype=self.dtype, name="patch_chain")(x)

        n = x.shape[1]
        cls_token = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        # pos table sized from the CONFIGURED image_size (reference
        # ViT_original builds num_patches+1 rows then slices [:n+1], so a
        # smaller-than-configured input works and torch checkpoints import
        # at any apply resolution)
        hp, wp = self.image_size // p1, self.image_size // p2
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, hp * wp + 1, self.dim)
        )
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (b, 1, self.dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos[:, : n + 1].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        x = Transformer(
            dim=self.dim, depth=self.depth, heads=self.heads, dim_head=self.dim_head,
            mlp_dim=self.mlp_dim, dropout=self.dropout, dtype=self.dtype,
            name="transformer",
        )(x, deterministic=deterministic)
        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="head_norm")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head_linear")(x)


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

    @property
    def pixels_per_patch(self) -> int:
        return self.patch_height * self.patch_width * self.channels

    def setup(self):
        img_h, img_w = _pair(self.image_size)
        assert img_h % self.patch_height == 0 and img_w % self.patch_width == 0

        self.patch_chain = _PatchChain(dim=self.dim, dtype=self.dtype)
        self.cls_token = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, self.num_patches + 1, self.dim)
        )
        self.emb_drop = nn.Dropout(self.emb_dropout)
        self.transformer = Transformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            dtype=self.dtype,
        )
        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        out_features = (
            self.num_classes * self.patch_height * self.patch_width
            if self.pixelwise
            else self.num_classes
        )
        self.head_linear = nn.Dense(out_features, dtype=self.dtype)

    def to_patch(self, img: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H, W] → raw patches [B, n, p1*p2*C] with channel-minor
        vectors (reference ``b c (h p1) (w p2) -> b (h w) (p1 p2 c)``)."""
        b, c, hh, ww = img.shape
        p1, p2 = self.patch_height, self.patch_width
        h, w = hh // p1, ww // p2
        x = img.reshape(b, c, h, p1, w, p2)
        x = x.transpose(0, 2, 4, 3, 5, 1)  # b h w p1 p2 c
        return x.reshape(b, h * w, p1 * p2 * c)

    def embed(self, patches: jnp.ndarray) -> jnp.ndarray:
        return self.patch_chain(patches)

    def encode(self, tokens: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        """Run the joint transformer over already-positioned tokens (no cls);
        the legacy SimMIM path (reference vit_simmim_original.py:118)."""
        return self.transformer(tokens, deterministic=deterministic)

    def __call__(self, img: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        x = self.embed(self.to_patch(img))
        b, n, _ = x.shape
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype), (b, 1, self.dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embedding[:, : n + 1].astype(x.dtype)
        x = self.emb_drop(x, deterministic=deterministic)
        x = self.transformer(x, deterministic=deterministic)

        x = x[:, 1:, :]  # drop cls (reference src/vit_original.py:193)
        x = x.reshape(b, self.num_patches_height, self.num_patches_width, self.dim)
        x = self.head_norm(x)
        x = self.head_linear(x)
        if self.pixelwise:
            return _unfold_pixel_logits(x, self.patch_height, self.patch_width, self.num_classes)
        # non-pixelwise head still runs per patch token (reference :163,181-202)
        return x
