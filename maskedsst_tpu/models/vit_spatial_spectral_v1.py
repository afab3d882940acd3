"""ViTSpatialSpectral_V1 — the legacy first-generation variant.

Reference: src/vit_spatial_spectral.py:600-764. Differences from the main
model: a shared (non-blockwise) patch embedding (raw patches are the SimMIM
reconstruction targets — the pre-norm LN belongs to the embedding chain, not
``to_patch``, reference vit_simmim_original.py:171-177), a learned positional
table of length ``num_patches + 1``, the same factorized spatial→spectral
transformer, and a per-patch-pixel classification head.
``transformer_forward`` returns the final representation three times (the
separate spatial/spectral branches are commented out upstream, :723-732),
which makes ``intermediate_losses`` exactly 3x the final loss.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from maskedsst_tpu.models.layers import LN_EPS, Transformer
from maskedsst_tpu.models.vit_spatial_spectral import _pair, _unfold_pixel_logits


class _V1Embed(nn.Module):
    """LN(patch_dim) → Linear(dim) → LN(dim) (reference :642-652, stages 1-3
    of the Sequential; the Rearrange stage is ``to_patch``)."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, patches):
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="pre_norm")(patches)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="post_norm")(x)


class ViTSpatialSpectralV1(nn.Module):
    image_size: int
    spatial_patch_size: int
    spectral_patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @property
    def patch_height(self) -> int:
        return _pair(self.spatial_patch_size)[0]

    @property
    def patch_width(self) -> int:
        return _pair(self.spatial_patch_size)[1]

    @property
    def patch_depth(self) -> int:
        return self.spectral_patch_size

    @property
    def num_spatial_patches(self) -> int:
        # NOTE: in V1 this is the grid SIDE length (reference :632), unlike
        # the main model where it is the count
        return _pair(self.image_size)[0] // self.patch_height

    @property
    def num_spectral_patches(self) -> int:
        return self.channels // self.patch_depth

    @property
    def num_patches(self) -> int:
        return self.num_spatial_patches**2 * self.num_spectral_patches

    @property
    def pixels_per_patch(self) -> int:
        return self.patch_depth * self.patch_height * self.patch_width

    def setup(self):
        tf_kwargs = dict(
            dim=self.dim, depth=self.depth, heads=self.heads,
            dim_head=self.dim_head, mlp_dim=self.mlp_dim,
            dropout=self.dropout, dtype=self.dtype,
        )
        self.embed_chain = _V1Embed(dim=self.dim, dtype=self.dtype)
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, self.num_patches + 1, self.dim)
        )
        self.emb_drop = nn.Dropout(self.emb_dropout)
        self.spatial_transformer = Transformer(**tf_kwargs)
        self.spectral_transformer = Transformer(**tf_kwargs)
        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.head_linear = nn.Dense(
            self.num_classes * self.patch_height * self.patch_width, dtype=self.dtype
        )

    def to_patch(self, img: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H, W] → raw patches [B, g*n, p] (block-major token order)."""
        b, c, hh, ww = img.shape
        p0, p1, p2 = self.patch_depth, self.patch_height, self.patch_width
        g, h, w = c // p0, hh // p1, ww // p2
        x = img.reshape(b, g, p0, h, p1, w, p2)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6)
        return x.reshape(b, g * h * w, p0 * p1 * p2)

    def embed(self, patches: jnp.ndarray) -> jnp.ndarray:
        return self.embed_chain(patches)

    def transformer_forward(self, x, *, deterministic: bool = True):
        """Factorized spatial→spectral stack; returns (x, x, x) to mirror the
        reference's vestigial multi-branch interface (:723-732)."""
        b, num_tokens, d = x.shape
        c = self.num_spectral_patches
        n = self.num_spatial_patches**2
        x = x.reshape(b, c, n, d)
        x = self.spatial_transformer(x, deterministic=deterministic)
        x = jnp.swapaxes(x, 1, 2)
        x = self.spectral_transformer(x, deterministic=deterministic)
        x = jnp.swapaxes(x, 1, 2).reshape(b, c * n, d)
        return x, x, x

    def __call__(self, img, *, deterministic: bool = True):
        x = self.embed(self.to_patch(img))
        n = x.shape[1]
        x = x + self.pos_embedding[:, :n].astype(x.dtype)
        x = self.emb_drop(x, deterministic=deterministic)
        x, _, _ = self.transformer_forward(x, deterministic=deterministic)

        b = x.shape[0]
        c = self.num_spectral_patches
        hw = self.num_spatial_patches
        x = x.reshape(b, c, hw, hw, self.dim).mean(axis=1)  # pool over spectral
        x = self.head_linear(self.head_norm(x))
        return _unfold_pixel_logits(x, self.patch_height, self.patch_width, self.num_classes)
