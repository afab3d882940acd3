"""On-device SimMIM mask generation.

The reference builds masks on the host with per-sample numpy loops and a
python batch loop (src/vit_simmim_original.py:343-416), then ships them to the
device. Here the sampler is a pure, jit-traceable function of a `jax.random`
key, vectorized with `vmap` — mask generation fuses into the train step and
never touches the host.

Semantics reproduced exactly (same distribution and the same quirks,
EXCEPT the reference's cross-sample masked-index bleed — see loss_weights):

* the image is divided into a ``rand_size x rand_size`` grid of
  ``mask_patch_size``-sized cells; ``mask_count = ceil(ratio * rand_size**2)``
  cells are chosen uniformly without replacement and upscaled by
  ``scale = mask_patch_size // model_patch_size``;
* tube masking replicates one spatial mask across all spectral blocks
  (get_batch_tube_masked, :404-416); otherwise every (sample, block) draws an
  independent mask (get_batch, :384-402);
* the boolean mask may mark more tokens than ``num_masked = int(ratio * N)``
  (ceil vs int); only the **first** ``num_masked`` marked positions in
  row-major token order participate in the reconstruction loss
  (bool_mask_to_indices, :372-382). ``loss_weights`` encodes that rule as a
  cumsum, so the loss needs no gather at all.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


class MaskGenerator:
    """Static geometry of the SimMIM mask (reference MaskGenerator.__init__,
    src/vit_simmim_original.py:345-360)."""

    def __init__(
        self,
        input_size: int = 16,
        mask_patch_size: int = 4,
        model_patch_size: int = 1,
        mask_ratio: float = 0.6,
    ):
        assert input_size % mask_patch_size == 0
        assert mask_patch_size % model_patch_size == 0
        self.input_size = input_size
        self.mask_patch_size = mask_patch_size
        self.model_patch_size = model_patch_size
        self.mask_ratio = mask_ratio
        self.rand_size = input_size // mask_patch_size
        self.scale = mask_patch_size // model_patch_size
        self.token_count = self.rand_size**2
        self.mask_count = int(math.ceil(self.token_count * mask_ratio))
        # spatial grid side length in model-patch units
        self.grid_size = input_size // model_patch_size

    # value-based identity: batch_masks jits with static self, and
    # SimMIMSpatialSpectral.setup builds a FRESH generator per apply — with
    # default identity hashing every eager apply would retrace (and remote-
    # compile, ~0.4 s each on the axon backend) and pin a cache entry per
    # instance
    def _key(self):
        return (
            self.input_size,
            self.mask_patch_size,
            self.model_patch_size,
            self.mask_ratio,
        )

    def __eq__(self, other):
        return isinstance(other, MaskGenerator) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def single(self, key: jax.Array) -> jnp.ndarray:
        """One spatial mask [grid, grid] (bool): mask_count random cells
        upscaled by ``scale`` (reference __call__, :362-370)."""
        perm = jax.random.permutation(key, self.token_count)
        flat = jnp.zeros((self.token_count,), bool).at[perm[: self.mask_count]].set(True)
        grid = flat.reshape(self.rand_size, self.rand_size)
        return jnp.repeat(jnp.repeat(grid, self.scale, axis=0), self.scale, axis=1)

    @partial(jax.jit, static_argnums=(0, 2, 3, 4))
    def batch_masks(
        self,
        key: jax.Array,
        batch_size: int,
        channel_tokens: int,
        tube: bool,
    ) -> jnp.ndarray:
        """Boolean mask [B, channel_tokens * grid * grid] in block-major token
        order. ``tube``: one spatial mask per sample broadcast over blocks;
        otherwise independent per (sample, block)."""
        if tube:
            keys = jax.random.split(key, batch_size)
            spatial = jax.vmap(self.single)(keys)  # [B, g, g]
            mask = jnp.broadcast_to(
                spatial[:, None], (batch_size, channel_tokens, *spatial.shape[1:])
            )
        else:
            keys = jax.random.split(key, batch_size * channel_tokens)
            masks = jax.vmap(self.single)(keys)
            mask = masks.reshape(batch_size, channel_tokens, *masks.shape[1:])
        return mask.reshape(batch_size, -1)


def random_token_mask(key: jax.Array, batch_size: int, num_tokens: int, num_masked: int) -> jnp.ndarray:
    """Uniform random subset mask for ``mask_patch_size == 1``
    (reference topk-of-rand path, src/vit_simmim_original.py:254-264).
    Returns bool [B, num_tokens] with exactly ``num_masked`` True per row."""
    keys = jax.random.split(key, batch_size)

    def one(k):
        perm = jax.random.permutation(k, num_tokens)
        return jnp.zeros((num_tokens,), bool).at[perm[:num_masked]].set(True)

    return jax.vmap(one)(keys)


def loss_weights(bool_mask: jnp.ndarray, num_masked: int) -> jnp.ndarray:
    """Float weights [B, N]: 1.0 on the first ``num_masked`` masked positions
    per row (row-major order), 0.0 elsewhere.

    DELIBERATE DEVIATION from the reference's ``bool_mask_to_indices``
    (:372-382): that code slices a nonzero list FLATTENED ACROSS THE BATCH
    at ``[num_masked*i : num_masked*(i+1)]``, but each sample marks MORE than
    ``num_masked`` tokens (ceil arithmetic), so for every sample after the
    first, the slice bleeds into indices drawn from EARLIER samples' masks —
    sample i reconstructs token positions that may not even be masked for it.
    This selects the first ``num_masked`` masked positions of EACH row
    (what the flattened slice computes for sample 0, and what the code
    plainly intends), expressed as a cumsum so the loss stays a pure
    elementwise reduction — no dynamic gather on TPU.
    """
    within = jnp.cumsum(bool_mask.astype(jnp.int32), axis=-1) <= num_masked
    return (bool_mask & within).astype(jnp.float32)


def masked_indices(bool_mask: jnp.ndarray, num_masked: int) -> jnp.ndarray:
    """First ``num_masked`` masked token indices per row, ascending
    (reference bool_mask_to_indices). Used by parity tests and the eval-time
    reconstruction API; the training loss uses :func:`loss_weights` instead.

    CONTRACT: every row must carry at least ``num_masked`` True entries
    (MaskGenerator guarantees it by construction). Rows with fewer pad with
    index 0 — flatnonzero's fill_value, unverifiable inside a traced
    context — so a caller-built mask violating the contract silently
    reconstructs token 0 repeatedly; validate externally."""

    def one(row):
        return jnp.flatnonzero(row, size=num_masked, fill_value=0)

    return jax.vmap(one)(bool_mask)
