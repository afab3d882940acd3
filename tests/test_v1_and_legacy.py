"""Parity tests for the legacy models: ViTSpatialSpectral_V1 and the
legacy SimMIM wrapper + V1/SimMIM intermediate-losses path."""

import jax
import jax.numpy as jnp
import numpy as np

from maskedsst_tpu.io.torch_import import import_vit_spatial_spectral_v1
from maskedsst_tpu.models import (
    SimMIM,
    SimMIMSpatialSpectral,
    ViTRGB,
    ViTSpatialSpectralV1,
)
from maskedsst_tpu.ops.masking import MaskGenerator, masked_indices
from tests.reference_oracle import load_reference

KW = dict(
    image_size=4,
    spatial_patch_size=1,
    spectral_patch_size=10,
    num_classes=3,
    dim=24,
    depth=2,
    heads=2,
    mlp_dim=16,
    dim_head=8,
    channels=20,
)


def test_v1_forward_parity():
    import torch

    _, ref_vss, _, _ = load_reference()
    torch.manual_seed(0)
    ref = ref_vss.ViTSpatialSpectral_V1(**KW)
    ref.eval()
    model = ViTSpatialSpectralV1(**KW)
    params = import_vit_spatial_spectral_v1(ref.state_dict(), model)
    x = np.random.default_rng(0).standard_normal((2, 20, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x), deterministic=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_v1_simmim_intermediate_losses():
    """V1 encoder + intermediate_losses: loss equals exactly 3x the single
    loss (reference transformer_forward returns the final representation
    three times)."""
    enc = ViTSpatialSpectralV1(**dict(KW, image_size=8))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 20, 8, 8)), jnp.float32)
    gen = MaskGenerator(input_size=8, mask_patch_size=4, mask_ratio=0.7)
    bool_mask = gen.batch_masks(jax.random.PRNGKey(0), 2, 2, True)

    def build(intermediate):
        return SimMIMSpatialSpectral(
            encoder=enc, masking_ratio=0.7, mask_patch_size=4, tube_masking=True,
            intermediate_losses=intermediate,
        )

    m1 = build(False)
    variables = m1.init(
        {"params": jax.random.PRNGKey(0)}, x, deterministic=True, bool_mask=bool_mask
    )
    l1 = float(m1.apply(variables, x, deterministic=True, bool_mask=bool_mask))
    m3 = build(True)
    l3 = float(m3.apply(variables, x, deterministic=True, bool_mask=bool_mask))
    np.testing.assert_allclose(l3, 3 * l1, rtol=1e-6)


def test_legacy_simmim_on_vitrgb():
    enc = ViTRGB(
        image_size=8, patch_size=2, num_classes=4, dim=16, depth=2, heads=2,
        mlp_dim=12, dim_head=8, channels=5,
    )
    mim = SimMIM(encoder=enc, masking_ratio=0.5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 5, 8, 8)), jnp.float32)
    variables = mim.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        x,
        deterministic=True,
    )
    loss, pred, masked_patches, idx, encoded = mim.apply(
        variables, x, deterministic=True, rngs={"mask": jax.random.PRNGKey(2)}
    )
    n = 16  # 4x4 patches
    num_masked = 8
    assert pred.shape == (3, num_masked, 2 * 2 * 5)
    assert masked_patches.shape == pred.shape
    assert idx.shape == (3, num_masked)
    assert encoded.shape == (3, n, 16)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_vit_rgb_parity_after_refactor():
    """The setup-style ViTRGB still matches the torch reference."""
    import torch

    from maskedsst_tpu.io.torch_import import import_vit_rgb

    _, _, _, ref_vit_original = load_reference()
    torch.manual_seed(0)
    kwargs = dict(
        image_size=6, patch_size=2, num_classes=4, dim=16, depth=2, heads=2,
        mlp_dim=12, dim_head=8, channels=5,
    )
    ref = ref_vit_original.ViTRGB(pixelwise=True, **kwargs)
    ref.eval()
    model = ViTRGB(pixelwise=True, **kwargs)
    params = import_vit_rgb(ref.state_dict(), model)
    x = np.random.default_rng(2).standard_normal((2, 5, 6, 6)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x), deterministic=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
