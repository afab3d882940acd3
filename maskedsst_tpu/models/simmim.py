"""SimMIM-style masked pre-training objective for ViTSpatialSpectral.

Reference: SimMIMSpatialSpectral (src/vit_simmim_original.py:139-340). The
forward computes the masked-reconstruction loss of a batch of hyperspectral
cubes:

  tokenize → embed → add pos → replace masked tokens with a learned mask
  token (+pos) → encode with the factorized transformer → predict the raw
  pixels of the masked patches → L1.

TPU redesign (same math, different dataflow):

* masks are drawn on-device from a `jax.random` key (see
  maskedsst_tpu/ops/masking.py) instead of host numpy loops;
* the reference gathers the ``num_masked`` encoded tokens and dispatches them
  through per-block decoders with a boolean-select python loop
  (BlockwiseToPixels, :9-40). Here **all** tokens are decoded with one batched
  einsum against a ``[blocks, dim, pixels]`` weight tensor — at reference
  shapes that is ~14x fewer FLOPs than a one-hot blockwise gather-decode and
  removes every dynamic gather from the hot loop — and the loss applies
  weights that select exactly the reference's "first int(ratio*N) masked
  positions" (ops/masking.loss_weights);
* the loss normalization reproduces the reference quirk of dividing the
  *mean* elementwise L1 by ``num_masked`` again (:338).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from maskedsst_tpu.models.vit_spatial_spectral import ViTSpatialSpectral
from maskedsst_tpu.ops.masking import (
    MaskGenerator,
    loss_weights,
    masked_indices as masked_token_indices,
    random_token_mask,
)


class BlockwiseToPixels(nn.Module):
    """Per-spectral-block linear decoder dim → pixels_per_patch, applied to all
    tokens at once as one einsum (reference BlockwiseToPixels loops over
    ``num_spectral_blocks`` Linears with boolean-select dispatch,
    src/vit_simmim_original.py:9-40)."""

    num_spectral_blocks: int
    dim: int
    pixels_per_patch: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, pn: bool = False) -> jnp.ndarray:
        """tokens [B, g, n, d] → pixel predictions [B, g, n, p] (or
        [B, g, p, n] when ``pn``); block g uses decoder g. One batched einsum
        over the block axis — the earlier block-diagonal dense form forced
        [.., g, n, d] ↔ [.., n, g*d] relayouts (not views under TPU lane
        tiling) that cost more than the batched matmul's per-instance
        overhead (see BlockwisePatchEmbedding.embed). The ``pn`` output
        layout keeps n (64) on the lane dim instead of p (10), matching
        to_patch_pn targets so the loss never touches a lane-hostile
        [.., n, p] array."""
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.num_spectral_blocks, self.dim, self.pixels_per_patch),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_spectral_blocks, self.pixels_per_patch)
        )
        dtype = self.dtype or tokens.dtype
        if pn:
            out = jnp.einsum(
                "bgnd,gdp->bgpn",
                tokens.astype(dtype),
                kernel.astype(dtype),
                preferred_element_type=dtype,
            )
            return out + bias.astype(dtype)[None, :, :, None]
        out = jnp.einsum(
            "bgnd,gdp->bgnp",
            tokens.astype(dtype),
            kernel.astype(dtype),
            preferred_element_type=dtype,
        )
        return out + bias.astype(dtype)[None, :, None, :]

    @nn.compact
    def decode_l1(self, encoded, patches_pn, weights, mesh=None, interpret: bool = False):
        """Fused decode + weighted-L1 tail (ops/fused_simmim.py): returns
        the UNNORMALIZED sum(weights · |decode(encoded) − patches|).
        Declares the identical parameter tree as ``__call__`` (exactly one
        of the two runs per trace). On a multi-device ``data`` mesh the
        kernel call is shard_mapped over the batch like the layer kernels
        (GSPMD treats Mosaic custom calls as opaque), with an explicit psum
        of the per-shard partial sums."""
        import jax as _jax

        from maskedsst_tpu.ops.fused_simmim import fused_decode_l1

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.num_spectral_blocks, self.dim, self.pixels_per_patch),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_spectral_blocks, self.pixels_per_patch)
        )
        # match __call__'s default (self.dtype or input dtype) so the fused
        # and XLA decode paths stay numerically interchangeable
        compute_dtype = self.dtype or encoded.dtype
        interpret = interpret or _jax.default_backend() == "cpu"

        from maskedsst_tpu.parallel.mesh import data_axis_or_warn

        n_data = data_axis_or_warn(
            mesh, encoded.shape[0], "BlockwiseToPixels.decode_l1"
        )
        if n_data > 1:
            from jax.sharding import PartitionSpec as P

            def run(e, pp, ww, k, bs):
                partial = fused_decode_l1(e, pp, k, bs, ww, compute_dtype, interpret)
                return _jax.lax.psum(partial, "data")

            return _jax.shard_map(
                run,
                mesh=mesh,
                in_specs=(P("data"), P("data"), P("data"), P(), P()),
                out_specs=P(),
                check_vma=False,
            )(encoded, patches_pn, weights, kernel, bias)
        return fused_decode_l1(
            encoded, patches_pn, kernel, bias, weights, compute_dtype, interpret
        )


class SimMIMSpatialSpectral(nn.Module):
    """Args mirror the reference constructor
    (src/vit_simmim_original.py:139-201). ``encoder`` is a constructed
    ViTSpatialSpectral module."""

    encoder: ViTSpatialSpectral
    masking_ratio: float = 0.5
    mask_patch_size: int = 1
    tube_masking: bool = False
    to_pixels_per_spectral_block: bool = False
    intermediate_losses: bool = False
    dtype: Optional[jnp.dtype] = None

    @property
    def _is_v1(self) -> bool:
        from maskedsst_tpu.models.vit_spatial_spectral_v1 import ViTSpatialSpectralV1

        return isinstance(self.encoder, ViTSpatialSpectralV1)

    def setup(self):
        assert 0 < self.masking_ratio < 1, "masking ratio must be in (0, 1)"
        enc = self.encoder
        self.pixel_values_per_patch = enc.pixels_per_patch
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(1.0), (enc.dim,)
        )
        if self.to_pixels_per_spectral_block:
            self.to_pixels = BlockwiseToPixels(
                num_spectral_blocks=enc.num_spectral_patches,
                dim=enc.dim,
                pixels_per_patch=self.pixel_values_per_patch,
                dtype=self.dtype,
            )
        else:
            self.to_pixels_linear = nn.Dense(
                self.pixel_values_per_patch, dtype=self.dtype, name="to_pixels_linear"
            )
        if self.mask_patch_size != 1:
            self.mask_generator = MaskGenerator(
                input_size=_scalar(enc.image_size),
                mask_patch_size=self.mask_patch_size,
                model_patch_size=enc.patch_height,
                mask_ratio=self.masking_ratio,
            )

    def __call__(
        self,
        img: jnp.ndarray,
        *,
        deterministic: bool = True,
        mask_rng: Optional[jnp.ndarray] = None,
        bool_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """cube [B, C, H, W] → scalar reconstruction loss.

        Masking randomness comes from ``mask_rng`` if given, else from the
        flax 'mask' RNG stream (pass ``rngs={'mask': key}`` to ``apply``).
        ``bool_mask`` [B, num_tokens] overrides the sampler entirely
        (deterministic eval, parity harnesses).
        """
        enc = self.encoder
        b = img.shape[0]
        n_spatial = (
            enc.num_spatial_patches**2 if self._is_v1 else enc.num_spatial_patches
        )
        n_blocks = enc.num_spectral_patches
        num_tokens = n_blocks * n_spatial

        # --- draw the mask on device (independent of the tokens) -----------
        num_masked = int(self.masking_ratio * num_tokens)
        if bool_mask is None:
            if mask_rng is None:
                mask_rng = self.make_rng("mask")
            if self.mask_patch_size == 1:
                bool_mask = random_token_mask(mask_rng, b, num_tokens, num_masked)
            else:
                bool_mask = self.mask_generator.batch_masks(
                    mask_rng, b, n_blocks, self.tube_masking
                )

        # blockwise (non-V1) patches use the [B, g, p, n] lane-friendly
        # layout end-to-end — see to_patch_pn
        pn_layout = not self._is_v1 and bool(
            getattr(enc, "blockwise_patch_embed", False)
        )
        fused_head = pn_layout and getattr(enc, "fused", False)

        # --- tokenize → embed → +pos → mask-token replacement ---------------
        if fused_head:
            # production path: the whole tokenization head runs as one
            # Pallas kernel per batch block (the encoder's tokenize_fused —
            # the one call site of the kernel's layout contract)
            tokens, patches = enc.tokenize_fused(
                img,
                mask=bool_mask.reshape(b, n_blocks, n_spatial).astype(jnp.float32),
                mask_token=self.mask_token,
            )
        else:
            if self._is_v1:
                flat = enc.to_patch(img)  # [B, g*n, p] raw (V1 LN in embed)
                tokens = enc.embed(flat)
                patches = flat.reshape(b, n_blocks, n_spatial, -1)
                # V1 wrapper slices the learned table at [1:n+1]
                # (reference vit_simmim_original.py:232-234)
                pos = enc.pos_embedding[:, 1 : num_tokens + 1].astype(tokens.dtype)
            elif pn_layout:
                patches = enc.to_patch_embedding.to_patch_pn(img)
                tokens = enc.to_patch_embedding.embed_pn(patches)  # [B, g*n, d]
                pos = enc.pos_embedding_for(num_tokens).astype(tokens.dtype)
            else:
                flat = enc.to_patch_embedding.to_patch(img)  # [B,g*n,p] LN'ed
                tokens = enc.to_patch_embedding.embed(flat)
                patches = flat.reshape(b, n_blocks, n_spatial, -1)
                pos = enc.pos_embedding_for(num_tokens).astype(tokens.dtype)
            tokens = tokens + pos
            # replace masked tokens with mask_token (+pos)
            mask_tokens = self.mask_token.astype(tokens.dtype)[None, None, :] + pos
            tokens = jnp.where(bool_mask[..., None], mask_tokens, tokens)

        # --- encode ---------------------------------------------------------
        encoded = enc.transformer_forward(tokens, deterministic=deterministic)
        if isinstance(encoded, tuple):  # V1 returns (x, x_spatial, x_spectral)
            encoded = encoded[0]
        encoded = encoded.reshape(b, n_blocks, n_spatial, enc.dim)

        # --- decode ALL tokens, weight the loss to the masked subset --------
        if self.intermediate_losses:
            from maskedsst_tpu.models.vit_spatial_spectral_v1 import (
                ViTSpatialSpectralV1,
            )

            assert isinstance(self.encoder, ViTSpatialSpectralV1), (
                "intermediate_losses requires the V1 encoder: the x3 factor "
                "reproduces V1's triple-representation sum "
                "(src/vit_spatial_spectral.py:723-732); the reference CRASHES "
                "on non-V1 encoders (NameError, vit_simmim_original.py:305) "
                "rather than training with a silent 3x loss scale"
            )
        if self.to_pixels_per_spectral_block and fused_head:
            # production path: one Pallas kernel for decode + weighted L1
            # (interpret mode off-TPU), fwd and custom-VJP bwd
            wsum = self.to_pixels.decode_l1(
                encoded, patches, loss_weights(bool_mask, num_masked),
                mesh=getattr(enc, "mesh", None),
            )
            denom = b * num_masked * self.pixel_values_per_patch
            recon_loss = wsum / denom / num_masked
            if self.intermediate_losses:
                recon_loss = recon_loss * 3.0  # see note below
            return recon_loss
        if self.to_pixels_per_spectral_block:
            preds = self.to_pixels(encoded, pn=pn_layout)  # [B,g,p,n] | [B,g,n,p]
        else:
            preds = self.to_pixels_linear(encoded)  # [B, g, n, p]
            if pn_layout:
                preds = jnp.swapaxes(preds, -1, -2)

        weights = loss_weights(bool_mask, num_masked)  # [B, g*n]
        if pn_layout:
            weights = weights.reshape(b, n_blocks, 1, n_spatial)
        else:
            weights = weights.reshape(b, n_blocks, n_spatial)[..., None]

        abs_err = jnp.abs(preds.astype(jnp.float32) - patches.astype(jnp.float32))
        # reference: F.l1_loss(pred, target).mean over (B, num_masked, p)
        # elements, then divided by num_masked again (:338)
        denom = b * num_masked * self.pixel_values_per_patch
        recon_loss = jnp.sum(abs_err * weights) / denom / num_masked
        if self.intermediate_losses:
            # reference V1 path sums the loss over [final, spatial, spectral]
            # representations; its transformer_forward returns the final
            # representation three times (src/vit_spatial_spectral.py:723-732),
            # so the sum is exactly 3x the final loss. Reproduced as-is.
            recon_loss = recon_loss * 3.0
        return recon_loss


class SimMIM(nn.Module):
    """Legacy SimMIM wrapper for plain-ViT encoders (reference SimMIM,
    src/vit_simmim_original.py:43-136, adapted to ViTRGB): random per-token
    masking at ``masking_ratio``, positions from the learned table rows
    1..n (cls row skipped), single linear pixel decoder. Returns the tuple
    ``(recon_loss, pred_pixel_values, masked_patches, masked_indices,
    encoded)`` like the reference."""

    encoder: "nn.Module"
    masking_ratio: float = 0.5

    def setup(self):
        assert 0 < self.masking_ratio < 1, "masking ratio must be in (0, 1)"
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(1.0), (self.encoder.dim,)
        )
        self.to_pixels = nn.Dense(self.encoder.pixels_per_patch, name="to_pixels")

    def __call__(
        self,
        img: jnp.ndarray,
        *,
        deterministic: bool = True,
        mask_rng: Optional[jnp.ndarray] = None,
    ):
        enc = self.encoder
        patches = enc.to_patch(img)
        b, num_patches, _ = patches.shape
        tokens = enc.embed(patches)
        pos = enc.pos_embedding[:, 1 : num_patches + 1].astype(tokens.dtype)
        tokens = tokens + pos

        num_masked = int(self.masking_ratio * num_patches)
        if mask_rng is None:
            mask_rng = self.make_rng("mask")
        bool_mask = random_token_mask(mask_rng, b, num_patches, num_masked)
        masked_indices = masked_token_indices(bool_mask, num_masked)

        mask_tokens = self.mask_token.astype(tokens.dtype)[None, None, :] + pos
        tokens = jnp.where(bool_mask[..., None], mask_tokens, tokens)

        encoded = enc.encode(tokens, deterministic=deterministic)
        encoded_masked = jnp.take_along_axis(encoded, masked_indices[..., None], axis=1)
        pred = self.to_pixels(encoded_masked)
        masked_patches = jnp.take_along_axis(patches, masked_indices[..., None], axis=1)
        recon_loss = (
            jnp.mean(jnp.abs(pred.astype(jnp.float32) - masked_patches.astype(jnp.float32)))
            / num_masked
        )
        return recon_loss, pred, masked_patches, masked_indices, encoded


def _scalar(size) -> int:
    return size if isinstance(size, int) else size[0]
