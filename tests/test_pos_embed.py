"""Golden tests for sin-cos positional embeddings vs the reference formulas
(src/pos_embed.py:16-63)."""

import numpy as np

from maskedsst_tpu.ops.pos_embed import get_1d_sincos_pos_embed, get_2d_sincos_pos_embed
from tests.reference_oracle import load_reference


def test_1d_matches_reference():
    ref_pos_embed, *_ = load_reference()
    for dim, pos in [(32, np.arange(20)), (8, np.array([0.5, 3.0, 7.25])), (64, np.arange(5))]:
        ours = get_1d_sincos_pos_embed(dim, pos)
        theirs = ref_pos_embed.get_1d_sincos_pos_embed_from_grid(dim, np.asarray(pos))
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-6)


def test_2d_matches_reference():
    ref_pos_embed, *_ = load_reference()
    for dim, grid in [(64, 8), (16, 4), (96, 3)]:
        ours = get_2d_sincos_pos_embed(dim, grid)
        theirs = ref_pos_embed.get_2d_sincos_pos_embed(dim, grid, cls_token=False)
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-6)
    ours_cls = get_2d_sincos_pos_embed(16, 4, cls_token=True)
    theirs_cls = ref_pos_embed.get_2d_sincos_pos_embed(16, 4, cls_token=True)
    np.testing.assert_allclose(ours_cls, theirs_cls, rtol=0, atol=1e-6)


def test_1d_shape_and_structure():
    emb = get_1d_sincos_pos_embed(16, np.arange(7))
    assert emb.shape == (7, 16)
    # position 0 → sin half all zeros, cos half all ones
    np.testing.assert_allclose(emb[0, :8], 0.0, atol=1e-7)
    np.testing.assert_allclose(emb[0, 8:], 1.0, atol=1e-7)


def test_interpolate_pos_embed_identity_and_resize():
    import numpy as np
    from maskedsst_tpu.ops.pos_embed import (
        get_2d_sincos_pos_embed,
        interpolate_pos_embed,
    )

    table = get_2d_sincos_pos_embed(32, 8)  # [64, 32]
    cls = np.random.default_rng(0).standard_normal((1, 32)).astype(np.float32)
    full = np.concatenate([cls, table], axis=0)[None]  # [1, 65, 32]

    # same grid size -> unchanged (including the extra token)
    same = interpolate_pos_embed(full, 8, num_extra_tokens=1)
    np.testing.assert_allclose(same, full, rtol=0, atol=0)

    # resize 8x8 -> 4x4: extra token untouched, grid rows resampled close to
    # the natively generated smaller table (sin-cos tables are smooth)
    smaller = interpolate_pos_embed(full, 4, num_extra_tokens=1)
    assert smaller.shape == (1, 1 + 16, 32)
    np.testing.assert_allclose(smaller[0, :1], cls, atol=0)
    native = get_2d_sincos_pos_embed(32, 4)
    # positions scale by 2 between the grids, so values differ; just check
    # the resample stays within the table's value range and is finite
    assert np.isfinite(smaller).all()
    assert np.abs(smaller).max() <= np.abs(full).max() * 1.5

    # 2-D (unbatched) input keeps its rank
    flat = interpolate_pos_embed(full[0], 4, num_extra_tokens=1)
    assert flat.shape == (17, 32)
