"""SimMIM reconstruction-loss parity vs the reference
(src/vit_simmim_original.py:139-340), with both sides forced onto the same
boolean mask so the comparison is purely numerical."""

import jax
import jax.numpy as jnp
import numpy as np

from maskedsst_tpu.io.torch_import import import_simmim
from maskedsst_tpu.models import SimMIMSpatialSpectral, ViTSpatialSpectral
from maskedsst_tpu.ops.masking import MaskGenerator, masked_indices
from tests.reference_oracle import load_reference

ENC_KWARGS = dict(
    image_size=8,
    spatial_patch_size=1,
    spectral_patch_size=10,
    num_classes=5,
    dim=24,
    depth=2,
    heads=2,
    mlp_dim=16,
    dim_head=8,
    channels=40,
    spectral_pos=[0, 1, 2, 3],
)


def _parity(ratio, to_pixels_per_block, tube, blockwise=True, spectral_pos_embed=True):
    import torch

    _, ref_vss, ref_simmim, _ = load_reference()
    torch.manual_seed(0)
    enc_kwargs = dict(ENC_KWARGS, blockwise_patch_embed=blockwise, spectral_pos_embed=spectral_pos_embed)
    ref_enc = ref_vss.ViTSpatialSpectral(**enc_kwargs)
    ref_mim = ref_simmim.SimMIMSpatialSpectral(
        encoder=ref_enc,
        masking_ratio=ratio,
        mask_patch_size=4,
        tube_masking=tube,
        to_pixels_per_spectral_block=to_pixels_per_block,
    )
    ref_mim.eval()

    batch = 3
    num_tokens = 4 * 64
    num_masked = int(ratio * num_tokens)

    # draw the mask with OUR sampler, feed it to BOTH sides
    gen = MaskGenerator(input_size=8, mask_patch_size=4, model_patch_size=1, mask_ratio=ratio)
    bool_mask = gen.batch_masks(jax.random.PRNGKey(0), batch, 4, tube)
    idx = masked_indices(bool_mask, num_masked)

    bool_t = torch.from_numpy(np.asarray(bool_mask))
    idx_t = torch.from_numpy(np.asarray(idx, dtype=np.int64))
    if tube:
        ref_mim.mask_generator.get_batch_tube_masked = lambda **kw: (bool_t, idx_t)
    else:
        ref_mim.mask_generator.get_batch = lambda **kw: (bool_t, idx_t)

    x = np.random.default_rng(3).standard_normal((batch, 40, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_loss = float(ref_mim(torch.from_numpy(x)))

    enc = ViTSpatialSpectral(**enc_kwargs)
    mim = SimMIMSpatialSpectral(
        encoder=enc,
        masking_ratio=ratio,
        mask_patch_size=4,
        tube_masking=tube,
        to_pixels_per_spectral_block=to_pixels_per_block,
    )
    params = import_simmim(ref_mim.state_dict(), mim)
    loss = float(
        mim.apply(
            {"params": params}, jnp.asarray(x), deterministic=True, bool_mask=bool_mask
        )
    )
    np.testing.assert_allclose(loss, ref_loss, rtol=2e-4)


def test_tube_blockwise_decoders():
    _parity(0.7, to_pixels_per_block=True, tube=True)


def test_tube_shared_decoder():
    _parity(0.7, to_pixels_per_block=False, tube=True)


def test_non_tube():
    _parity(0.5, to_pixels_per_block=True, tube=False)


def test_learned_pos_embed():
    _parity(0.7, to_pixels_per_block=True, tube=True, spectral_pos_embed=False)


def test_shared_patch_embed_targets_are_normed():
    """Non-blockwise embed: reconstruction targets are the LN'ed patches."""
    _parity(0.7, to_pixels_per_block=False, tube=True, blockwise=False)


def test_mask_patch_size_1_runs():
    """The topk path (mask_patch_size=1) — distribution-level check only."""
    enc = ViTSpatialSpectral(**dict(ENC_KWARGS, blockwise_patch_embed=True))
    mim = SimMIMSpatialSpectral(encoder=enc, masking_ratio=0.5, mask_patch_size=1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 40, 8, 8)), jnp.float32)
    variables = mim.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        x,
        deterministic=True,
    )
    loss = mim.apply(
        variables, x, deterministic=True, rngs={"mask": jax.random.PRNGKey(2)}
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
