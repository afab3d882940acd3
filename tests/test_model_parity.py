"""Logits-parity tests: reference PyTorch models → state dict → importer →
flax forward, compared elementwise (BASELINE.md target <1e-3; we assert much
tighter in fp32). This is the inference_example.ipynb path (SURVEY.md §3.5)
minus the missing checkpoint blobs — state dicts are produced live by the
reference code acting as an oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskedsst_tpu.io.torch_import import import_vit_rgb, import_vit_spatial_spectral
from maskedsst_tpu.models import ViTRGB, ViTSpatialSpectral
from tests.reference_oracle import load_reference

ATOL = 2e-5


def _common_kwargs(**overrides):
    kwargs = dict(
        image_size=4,
        spatial_patch_size=1,
        spectral_patch_size=10,
        num_classes=5,
        dim=24,
        depth=2,
        heads=2,
        mlp_dim=16,
        dim_head=8,
        channels=20,
        spectral_pos=[0, 1],
    )
    kwargs.update(overrides)
    return kwargs


def _run_parity(torch_kwargs, jax_kwargs=None, batch=3):
    import torch

    _, ref_vss, _, _ = load_reference()
    torch.manual_seed(0)
    ref_model = ref_vss.ViTSpatialSpectral(**torch_kwargs)
    ref_model.eval()

    model = ViTSpatialSpectral(**(jax_kwargs or torch_kwargs))
    params = import_vit_spatial_spectral(ref_model.state_dict(), model)

    rng = np.random.default_rng(1)
    x = rng.standard_normal(
        (batch, torch_kwargs["channels"], torch_kwargs["image_size"], torch_kwargs["image_size"])
    ).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x)).numpy()
    out = model.apply({"params": params}, jnp.asarray(x), deterministic=True)
    out = np.asarray(out)

    assert out.shape == ref_out.shape, (out.shape, ref_out.shape)
    np.testing.assert_allclose(out, ref_out, atol=ATOL, rtol=1e-4)
    return ref_model, model, params


def test_blockwise_spectral_pos_embed():
    _run_parity(_common_kwargs(spectral_pos_embed=True, blockwise_patch_embed=True))


def test_blockwise_learned_pos():
    _run_parity(_common_kwargs(spectral_pos_embed=False, blockwise_patch_embed=True))


def test_shared_patch_embed():
    _run_parity(_common_kwargs(spectral_pos_embed=True, blockwise_patch_embed=False))


def test_spectral_only():
    _run_parity(_common_kwargs(spectral_only=True))


def test_pixelwise_head():
    _run_parity(_common_kwargs(pixelwise=True, image_size=5))


def test_spectral_mlp_head():
    _run_parity(_common_kwargs(spectral_mlp_head=True))


def test_spatial_patch_2():
    _run_parity(_common_kwargs(spatial_patch_size=2, image_size=6))


def test_reference_config_geometry():
    """Full reference config (dim 96, depth 4, 8x8x200 EnMAP cube,
    configs/config.yaml) — the checkpoint-fidelity geometry."""
    _run_parity(
        dict(
            image_size=8,
            spatial_patch_size=1,
            spectral_patch_size=10,
            num_classes=8,
            dim=96,
            depth=4,
            heads=8,
            mlp_dim=64,
            channels=200,
            spectral_pos=list(range(20)),
            spectral_pos_embed=True,
            blockwise_patch_embed=True,
        ),
        batch=2,
    )


def test_pos_embed_init_matches_reference():
    """Our sincos-initialized params equal the reference's fresh tables."""
    import torch

    _, ref_vss, _, _ = load_reference()
    torch.manual_seed(0)
    kwargs = _common_kwargs(spectral_pos_embed=True)
    ref_model = ref_vss.ViTSpatialSpectral(**kwargs)

    model = ViTSpatialSpectral(**kwargs)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 4, 4)))
    np.testing.assert_allclose(
        np.asarray(variables["params"]["pos_embed"]),
        ref_model.pos_embed.detach().numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(variables["params"]["channel_embed"]),
        ref_model.channel_embed.detach().numpy(),
        atol=1e-6,
    )


def test_vit_rgb_parity():
    import torch

    _, _, _, ref_vit_original = load_reference()
    for pixelwise in (True, False):
        torch.manual_seed(0)
        kwargs = dict(
            image_size=6,
            patch_size=2,
            num_classes=4,
            dim=16,
            depth=2,
            heads=2,
            mlp_dim=12,
            dim_head=8,
            channels=5,
        )
        ref_model = ref_vit_original.ViTRGB(pixelwise=pixelwise, **kwargs)
        ref_model.eval()
        model = ViTRGB(pixelwise=pixelwise, **kwargs)
        params = import_vit_rgb(ref_model.state_dict(), model)

        x = np.random.default_rng(2).standard_normal((2, 5, 6, 6)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref_model(torch.from_numpy(x)).numpy()
        out = np.asarray(model.apply({"params": params}, jnp.asarray(x), deterministic=True))
        assert out.shape == ref_out.shape
        np.testing.assert_allclose(out, ref_out, atol=ATOL, rtol=1e-4)


def test_exported_pth_loads_into_reference(tmp_path):
    """The .pth export path: our params → reference state-dict keys →
    torch.save → reference ``load_state_dict(strict=True)`` → identical
    logits. The file-level counterpart of test_export_import_roundtrip."""
    import torch

    from maskedsst_tpu.io.torch_import import export_vit_spatial_spectral

    _, ref_vss, _, _ = load_reference()
    kwargs = _common_kwargs()
    model = ViTSpatialSpectral(**kwargs)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, kwargs["channels"], 4, 4)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(x), deterministic=True)["params"]

    sd = export_vit_spatial_spectral(params, model)
    path = tmp_path / "exported.pth"
    torch.save(
        {"model_state_dict": {k: torch.from_numpy(v.copy()) for k, v in sd.items()}},
        path,
    )

    ref_model = ref_vss.ViTSpatialSpectral(**kwargs)
    blob = torch.load(path, map_location="cpu", weights_only=False)
    missing, unexpected = ref_model.load_state_dict(blob["model_state_dict"], strict=True)
    assert not missing and not unexpected
    ref_model.eval()

    with torch.no_grad():
        want = ref_model(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x), deterministic=True))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-4)


def test_spectral_layout_out_contract():
    """transformer_forward(spectral_layout_out=True) is exactly the default
    block-major output with the restore transpose undone — the contract the
    classifier heads rely on (vit_spatial_spectral.py:227)."""
    kwargs = _common_kwargs()
    del kwargs["spectral_pos"]
    model = ViTSpatialSpectral(**kwargs, spectral_pos=[0, 1])
    rng = np.random.default_rng(3)
    x = rng.standard_normal(
        (2, kwargs["channels"], kwargs["image_size"], kwargs["image_size"])
    ).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), deterministic=True)["params"]

    def features(layout):
        return model.apply(
            {"params": params},
            jnp.asarray(x),
            deterministic=True,
            spectral_layout_out=layout,
            method=model.forward_features,
        )

    default = np.asarray(features(False))  # [B, c*n, d] block-major
    spectral = np.asarray(features(True))  # [B, n, c, d]
    b, _, d = default.shape
    c = model.num_spectral_patches
    n = model.num_spatial_patches_sqrt**2
    restored = np.swapaxes(spectral, 1, 2).reshape(b, c * n, d)
    np.testing.assert_array_equal(restored, default)
