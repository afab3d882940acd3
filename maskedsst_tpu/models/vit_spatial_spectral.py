"""ViTSpatialSpectral — factorized spatial-spectral vision transformer.

TPU-native redesign of the reference model
(src/vit_spatial_spectral.py:256-564). The factorization is preserved — it is
the model: instead of joint attention over all ``c*h*w`` tokens, a spatial
transformer attends over the ``h*w`` axis with the spectral axis folded into
the batch, then a spectral transformer attends over the ``c`` axis with the
spatial positions folded into the batch
(src/vit_spatial_spectral.py:409-431). Here the fold is a zero-copy axis
transpose on a 4-D ``[B, c, hw, d]`` token array whose leading axes are batch
axes of the attention kernel — XLA sees large batched matmuls it can tile
onto the MXU without any data movement beyond one transpose between the two
transformer stacks.

Config switches mirror the reference: ``blockwise_patch_embed``,
``spectral_pos_embed`` (sin-cos spatial⊗spectral) vs learned ``pos_embedding``,
``spectral_only``, ``spectral_mlp_head``, ``pixelwise``, ``pos_embed_len``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from maskedsst_tpu.models.layers import (
    LN_EPS,
    BlockwisePatchEmbedding,
    FusedTransformer,
    PatchEmbed,
    Transformer,
)
from maskedsst_tpu.ops.pos_embed import get_1d_sincos_pos_embed, get_2d_sincos_pos_embed


def _pair(t):
    return t if isinstance(t, (tuple, list)) else (t, t)


class ViTSpatialSpectral(nn.Module):
    """Args mirror the reference constructor
    (src/vit_spatial_spectral.py:256-301)."""

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
    spectral_pos_embed: bool = True
    blockwise_patch_embed: bool = True
    spectral_pos: Optional[Sequence[int]] = None
    spectral_only: bool = False
    spectral_mlp_head: bool = False
    pixelwise: bool = False
    pos_embed_len: Optional[int] = None
    dtype: Optional[jnp.dtype] = None
    # run the transformer stacks through the fused Pallas layer kernel
    # (identical param tree and math; see ops/fused_layer.py)
    fused: bool = False
    # with fused=True on a multi-device data mesh, the kernel calls are
    # shard_mapped over the 'data' axis (GSPMD cannot partition the Mosaic
    # custom call; see FusedTransformer)
    mesh: Optional[jax.sharding.Mesh] = None

    # ---- static geometry --------------------------------------------------
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
    def num_spatial_patches_sqrt(self) -> int:
        return _pair(self.image_size)[0] // self.patch_height

    @property
    def num_spatial_patches(self) -> int:
        return self.num_spatial_patches_sqrt**2

    @property
    def num_spectral_patches(self) -> int:
        return self.channels // self.patch_depth

    @property
    def num_patches(self) -> int:
        return self.num_spatial_patches * self.num_spectral_patches

    @property
    def pixels_per_patch(self) -> int:
        return self.patch_depth * self.patch_height * self.patch_width

    def setup(self):
        img_h, img_w = _pair(self.image_size)
        # square scenes only: num_spatial_patches squares the height-derived
        # count and the SimMIM mask geometry takes one side — a rectangular
        # tuple would pass the divisibility check here and die much later in
        # transformer_forward's token-count assert (far from the cause)
        assert img_h == img_w, f"image_size must be square, got {img_h}x{img_w}"
        assert (
            img_h % self.patch_height == 0
            and img_w % self.patch_width == 0
            and self.channels % self.patch_depth == 0
        ), (
            "Image dimensions must be divisible by the patch size: "
            f"{img_h=} {self.patch_height=} {img_w=} {self.patch_width=} "
            f"{self.channels=} {self.patch_depth=}"
        )

        if self.blockwise_patch_embed:
            self.to_patch_embedding = BlockwisePatchEmbedding(
                num_channels=self.channels,
                dim=self.dim,
                patch_depth=self.patch_depth,
                patch_height=self.patch_height,
                patch_width=self.patch_width,
                dtype=self.dtype,
            )
        else:
            self.to_patch_embedding = PatchEmbed(
                dim=self.dim,
                patch_depth=self.patch_depth,
                patch_height=self.patch_height,
                patch_width=self.patch_width,
                dtype=self.dtype,
            )

        if self.spectral_pos_embed:
            # 1/3 of the embedding vector encodes the spectral block position,
            # the rest the 2-D spatial position (reference :352-381).
            channel_embed_dim = self.dim // 3
            pos_embed_dim = self.dim - channel_embed_dim
            spectral_pos = (
                np.arange(self.num_spectral_patches)
                if self.spectral_pos is None
                else np.asarray(self.spectral_pos)
            )
            assert len(spectral_pos) == self.num_spectral_patches, (
                f"{len(spectral_pos)=} != {self.num_spectral_patches=}"
            )
            spatial_table = get_2d_sincos_pos_embed(
                pos_embed_dim, self.num_spatial_patches_sqrt
            )[None]
            spectral_table = get_1d_sincos_pos_embed(channel_embed_dim, spectral_pos)[None]
            # Trainable, sin-cos-initialized (the reference stores them as
            # nn.Parameters seeded with the sin-cos tables).
            self.pos_embed = self.param(
                "pos_embed", lambda rng: jnp.asarray(spatial_table, jnp.float32)
            )
            self.channel_embed = self.param(
                "channel_embed", lambda rng: jnp.asarray(spectral_table, jnp.float32)
            )
        else:
            length = (
                self.pos_embed_len
                if self.pos_embed_len is not None
                else self.num_patches + 1
            )
            self.pos_embedding = self.param(
                "pos_embedding", nn.initializers.normal(1.0), (1, length, self.dim)
            )

        self.emb_drop = nn.Dropout(self.emb_dropout)

        tf_kwargs = dict(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            dtype=self.dtype,
        )
        tf_cls = FusedTransformer if self.fused else Transformer
        if self.fused:
            tf_kwargs["mesh"] = self.mesh
        if self.spectral_only:
            self.spectral_transformer = tf_cls(**tf_kwargs)
        else:
            self.spatial_transformer = tf_cls(**tf_kwargs)
            self.spectral_transformer = tf_cls(**tf_kwargs)

        # classification heads (reference :437-493): pixelwise emits one
        # logit vector per image; the per-patch-pixel heads (default and
        # spectral_mlp_head — same layout, different forward consumption)
        # emit num_classes per patch pixel
        num_out_pixels = self.patch_height * self.patch_width
        width = self.num_classes if self.pixelwise else self.num_classes * num_out_pixels
        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.head_linear = nn.Dense(width, dtype=self.dtype)

    # ---- sub-entry points (used by the SimMIM wrapper, reference :495-534) --
    def get_pos_embeddings(self) -> jnp.ndarray:
        """Combined positional table [1, c*n, dim]: spatial embedding repeated
        across blocks, spectral embedding across positions, concatenated with
        the spatial part first (reference get_pos_embeddings, :501-516)."""
        c = self.num_spectral_patches
        n = self.num_spatial_patches
        pos = jnp.broadcast_to(
            self.pos_embed[:, None, :, :], (1, c, n, self.pos_embed.shape[-1])
        )
        chan = jnp.broadcast_to(
            self.channel_embed[:, :, None, :], (1, c, n, self.channel_embed.shape[-1])
        )
        combined = jnp.concatenate([pos, chan], axis=-1)
        return combined.reshape(1, c * n, self.dim)

    def pos_embedding_for(self, num_tokens: int) -> jnp.ndarray:
        """Positional table added to ``num_tokens`` tokens [1, num_tokens, dim]."""
        if self.spectral_pos_embed:
            return self.get_pos_embeddings()
        return self.pos_embedding[:, :num_tokens]

    def transformer_forward(
        self, x, *, deterministic: bool = True, spectral_layout_out: bool = False
    ) -> jnp.ndarray:
        """Factorized transformer over tokens [B, c*n, d] (block-major).

        Reshapes to [B, c, n, d]; the spatial stack treats (B, c) as batch,
        the spectral stack (B, n) — one transpose between them, no gathers.

        ``spectral_layout_out=True`` returns the spectral stack's native
        layout [B, n, c, d] and skips the final ``swapaxes`` — a physical
        relayout under TPU tiling whose only purpose is restoring block-major
        token order. The classifier heads are spectral-order-invariant
        (mean-pool) or consume [B, n, c, d] directly (``spectral_mlp_head``),
        so they take this path; SimMIM needs block-major for the per-block
        decode and keeps the default.
        """
        b, num_tokens, d = x.shape
        c = self.num_spectral_patches
        n = self.num_spatial_patches
        assert num_tokens == c * n, f"{num_tokens=} != {c=}*{n=}"
        x = x.reshape(b, c, n, d)
        if not self.spectral_only:
            x = self.spatial_transformer(x, deterministic=deterministic)
        x = jnp.swapaxes(x, 1, 2)  # [B, n, c, d]
        x = self.spectral_transformer(x, deterministic=deterministic)
        if spectral_layout_out:
            return x  # [B, n, c, d]
        x = jnp.swapaxes(x, 1, 2)  # [B, c, n, d]
        return x.reshape(b, c * n, d)

    def tokenize_fused(self, img, mask=None, mask_token=None):
        """Fused tokenization head (ops/fused_embed.py): to_patch_pn →
        pre-LN → blockwise embed → post-LN → +pos → mask-token replacement,
        one Pallas kernel per batch block. The single call site for the
        kernel's layout contract ([B, g, p, n] patches, pos [g, n, d]) —
        shared by the classifier forward (zero mask/mask-token: the select
        reduces to the identity) and SimMIM (real mask + learned token).

        Returns ``(tokens [B, g*n, d], patches [B, g, p, n])`` — SimMIM
        consumes the raw patches as its reconstruction targets."""
        b = img.shape[0]
        c = self.num_spectral_patches
        n = self.num_spatial_patches
        patches = self.to_patch_embedding.to_patch_pn(img)
        pos = self.pos_embedding_for(c * n)
        tokens = self.to_patch_embedding.embed_mask_fused(
            patches,
            pos.reshape(c, n, self.dim),
            jnp.zeros((self.dim,), jnp.float32) if mask_token is None else mask_token,
            jnp.zeros((b, c, n), jnp.float32) if mask is None else mask,
            mesh=self.mesh,
        ).reshape(b, c * n, self.dim)
        return tokens, patches

    def forward_features(
        self, img, *, deterministic: bool = True, spectral_layout_out: bool = False
    ) -> jnp.ndarray:
        """Tokenize, add positions, run the factorized transformer
        (reference forward_features, :518-534). ``spectral_layout_out``
        propagates to :meth:`transformer_forward` (returns [B, n, c, d]).

        With ``fused=True`` and a blockwise embedding, the tokenize→+pos
        prologue runs through the fused Pallas embed kernel
        (ops/fused_embed.py) with a zero mask and zero mask-token — the
        select reduces to the identity, so the math is the SimMIM kernel's
        with the masking disabled, replacing the embed/pos XLA glue fusions
        in the classifier (serving/finetune) forward. Falls back to the XLA
        expression when embedding dropout is active (the kernel has no
        dropout site)."""
        if (
            self.fused
            and self.blockwise_patch_embed
            and (deterministic or self.emb_dropout == 0.0)
        ):
            tokens, _ = self.tokenize_fused(img)
            return self.transformer_forward(
                tokens,
                deterministic=deterministic,
                spectral_layout_out=spectral_layout_out,
            )
        x = self.to_patch_embedding(img)
        x = x + self.pos_embedding_for(x.shape[1]).astype(x.dtype)
        x = self.emb_drop(x, deterministic=deterministic)
        return self.transformer_forward(
            x, deterministic=deterministic, spectral_layout_out=spectral_layout_out
        )

    def __call__(self, img, *, deterministic: bool = True) -> jnp.ndarray:
        """Forward pass: cube [B, C, H, W] → logits.

        Default head: per-patch-pixel logits [B, num_classes, H, W]
        (reference :536-564). ``pixelwise``: single logit vector
        [B, num_classes]. ``spectral_mlp_head``: per-pixel logits from the
        concatenated per-block tokens.
        """
        # heads consume the spectral stack's [B, n, c, d] layout directly —
        # the block-major restore transpose never runs (see
        # transformer_forward docstring)
        x = self.forward_features(
            img, deterministic=deterministic, spectral_layout_out=True
        )
        b = x.shape[0]
        c = self.num_spectral_patches
        hh = ww = self.num_spatial_patches_sqrt
        p1, p2 = self.patch_height, self.patch_width

        if self.spectral_mlp_head:
            # [B, n, c, d] -> b h w (c d), block index major in the last dim
            x = x.reshape(b, hh, ww, c * self.dim)
            x = self.head_linear(self.head_norm(x))
            return _unfold_pixel_logits(x, p1, p2, self.num_classes)

        x = x.mean(axis=2)  # mean-pool over spectral blocks: [B, n, d]
        x = x.reshape(b, hh, ww, self.dim)

        if self.pixelwise:
            # LN over d, flatten all tokens, one Linear → [B, num_classes]
            # (the reference reshapes through [b, p1, p2, cls] with p1=p2=1
            # and squeezes, reference :467-479)
            x = self.head_norm(x)
            x = x.reshape(b, hh * ww * self.dim)
            return self.head_linear(x)

        x = self.head_linear(self.head_norm(x))
        return _unfold_pixel_logits(x, p1, p2, self.num_classes)


def _unfold_pixel_logits(x: jnp.ndarray, p1: int, p2: int, num_classes: int) -> jnp.ndarray:
    """[B, h, w, p1*p2*num_classes] → [B, num_classes, h*p1, w*p2]
    (reference einops ``b h w (p1 p2 cls) -> b (h p1) (w p2) cls`` + moveaxis)."""
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, p1, p2, num_classes)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b h p1 w p2 cls
    x = x.reshape(b, h * p1, w * p2, num_classes)
    return jnp.moveaxis(x, -1, 1)
