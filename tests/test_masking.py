"""Invariants of the on-device mask sampler vs the reference MaskGenerator
(src/vit_simmim_original.py:343-416)."""

import jax
import jax.numpy as jnp
import numpy as np

from maskedsst_tpu.ops.masking import (
    MaskGenerator,
    loss_weights,
    masked_indices,
    random_token_mask,
)


def test_geometry_matches_reference_arithmetic():
    gen = MaskGenerator(input_size=8, mask_patch_size=4, model_patch_size=1, mask_ratio=0.7)
    assert gen.rand_size == 2
    assert gen.scale == 4
    assert gen.token_count == 4
    assert gen.mask_count == 3  # ceil(4 * 0.7)
    assert gen.grid_size == 8


def test_single_mask_counts_and_upscale():
    gen = MaskGenerator(input_size=8, mask_patch_size=4, model_patch_size=1, mask_ratio=0.7)
    mask = np.asarray(gen.single(jax.random.PRNGKey(0)))
    assert mask.shape == (8, 8)
    assert mask.sum() == gen.mask_count * gen.scale**2  # 3 cells * 16 px
    # upscaled structure: each 4x4 cell is constant
    cells = mask.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).reshape(4, 16)
    assert all(c.all() or not c.any() for c in cells)


def test_tube_masks_replicate_across_blocks():
    gen = MaskGenerator(input_size=8, mask_patch_size=4, mask_ratio=0.7)
    batch = np.asarray(gen.batch_masks(jax.random.PRNGKey(1), 4, 20, True))
    assert batch.shape == (4, 20 * 64)
    per_block = batch.reshape(4, 20, 64)
    for b in range(4):
        assert (per_block[b] == per_block[b, 0]).all(), "tube mask must repeat per block"
    # different samples differ (overwhelmingly likely)
    assert not (per_block[0, 0] == per_block[1, 0]).all() or not (
        per_block[0, 0] == per_block[2, 0]
    ).all()


def test_non_tube_masks_independent_per_block():
    gen = MaskGenerator(input_size=8, mask_patch_size=4, mask_ratio=0.7)
    batch = np.asarray(gen.batch_masks(jax.random.PRNGKey(2), 2, 20, False))
    per_block = batch.reshape(2, 20, 64)
    # per-block counts identical, patterns not all identical
    assert (per_block.sum(-1) == 48).all()
    assert not all((per_block[0, g] == per_block[0, 0]).all() for g in range(20))


def test_loss_weights_equal_first_num_masked_indices():
    gen = MaskGenerator(input_size=8, mask_patch_size=4, mask_ratio=0.7)
    bool_mask = gen.batch_masks(jax.random.PRNGKey(3), 8, 20, True)
    num_masked = int(0.7 * 1280)  # 896 < 960 marked
    w = np.asarray(loss_weights(bool_mask, num_masked))
    idx = np.asarray(masked_indices(bool_mask, num_masked))
    assert w.sum(-1).tolist() == [num_masked] * 8
    for b in range(8):
        np.testing.assert_array_equal(np.flatnonzero(w[b]), np.sort(idx[b]))
        # indices are ascending row-major nonzero order (reference
        # bool_mask_to_indices walks nonzero() output in order)
        assert (np.diff(idx[b]) > 0).all()


def test_random_token_mask_exact_count():
    mask = np.asarray(random_token_mask(jax.random.PRNGKey(4), 6, 100, 37))
    assert mask.shape == (6, 100)
    assert (mask.sum(-1) == 37).all()


def test_mask_distribution_uniform():
    """Each cell should be masked with probability mask_count/token_count."""
    gen = MaskGenerator(input_size=8, mask_patch_size=4, mask_ratio=0.7)
    n = 2000
    masks = np.asarray(
        jax.vmap(gen.single)(jax.random.split(jax.random.PRNGKey(5), n))
    )
    cell_rate = masks.reshape(n, 2, 4, 2, 4).any(axis=(2, 4)).mean(axis=0)
    np.testing.assert_allclose(cell_rate, 0.75, atol=0.05)  # 3/4 cells masked


def test_batch_masks_jits_and_is_deterministic():
    gen = MaskGenerator(input_size=8, mask_patch_size=4, mask_ratio=0.7)
    a = gen.batch_masks(jax.random.PRNGKey(7), 4, 20, True)
    b = gen.batch_masks(jax.random.PRNGKey(7), 4, 20, True)
    assert (np.asarray(a) == np.asarray(b)).all()
