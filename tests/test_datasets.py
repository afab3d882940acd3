"""Dataset-semantics tests that run without geo libraries: Houston2018 scene
geometry with injected arrays, transforms, export/import round trip, EnMAP
pixel-location mode."""

import pickle

import numpy as np
import pytest

from maskedsst_tpu.data.houston2018 import Houston2018Dataset, _patchify
from maskedsst_tpu.data.transforms import (
    dfc_label_transform,
    houston2018_label_transform,
    max_normalize_all_bands_same,
    max_normalize_enmap,
    standardize_enmap,
    standardize_houston2018,
    unstandardize_enmap,
    worldcover_label_transform,
)


def _fake_scene(h=700, w=3200, c=50, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((c, h, w)).astype(np.float32)
    label = rng.integers(-1, 20, size=(h, w)).astype(np.int64)
    return img, label


def test_houston_test_split_geometry():
    img, label = _fake_scene()
    ds = Houston2018Dataset(
        path="", label_path="", patch_size=8, test=True, fix_train_patches=False,
        img=img, label=label,
    )
    # three test rectangles tiled at 8x8, trailing remainders trimmed
    expect = 0
    for area in [(700, 596), (601, 2384), (700, 220)]:
        expect += (area[0] // 8) * (area[1] // 8)
    assert len(ds) == expect
    s = ds[0]
    assert s["img"].shape == (50, 8, 8)
    assert s["label"].shape == (8, 8)


def test_houston_train_random_patches_aligned():
    img, label = _fake_scene()
    # encode position in the label so alignment is checkable:
    # label[x, y] = (x * 3200 + y) % 17
    coords = (np.arange(700)[:, None] * 3200 + np.arange(3200)[None, :]) % 17
    img2 = np.broadcast_to(coords[None].astype(np.float32), img.shape).copy()
    ds = Houston2018Dataset(
        path="", label_path="", patch_size=8, test=False, fix_train_patches=False,
        drop_unlabeled=False, img=img2, label=coords.astype(np.int64),
    )
    s = ds[0]
    np.testing.assert_array_equal(s["img"][0].astype(np.int64), s["label"])


def test_houston_pixelwise_mode():
    img, label = _fake_scene(h=650, w=3000)
    ds = Houston2018Dataset(
        path="", label_path="", patch_size=7, test=False, fix_train_patches=False,
        pixelwise=True, img=img, label=label,
    )
    s = ds[0]
    assert s["img"].shape == (50, 7, 7)
    assert np.ndim(s["label"]) == 0 and s["label"] != -1


def test_patchify_counts():
    img = np.zeros((3, 20, 26))
    label = np.zeros((20, 26))
    ip, lp = _patchify(img, label, 8)
    assert ip.shape == (2 * 3, 3, 8, 8)
    assert lp.shape == (6, 8, 8)


def test_label_transforms_golden():
    # matches the reference transform EXACTLY, including its quirk that codes
    # 90 and 100 collapse to class 0 (x[x==90]=10 then //10-1; verified
    # against src/data_enmap.py:544-551)
    wc = np.array([0, 10, 20, 90, 95, 100])
    np.testing.assert_array_equal(worldcover_label_transform(wc), [-1, 0, 1, 0, 8, 0])
    dfc = np.arange(1, 11)
    np.testing.assert_array_equal(
        dfc_label_transform(dfc), [0, 1, -1, 2, 3, 4, 5, -1, 6, 7]
    )
    np.testing.assert_array_equal(houston2018_label_transform(np.array([0, 1, 20])), [-1, 0, 19])


def test_standardize_roundtrip():
    x = np.random.default_rng(0).standard_normal((200, 4, 4)) * 500 + 1000
    z = standardize_enmap(x)
    np.testing.assert_allclose(unstandardize_enmap(z), x, rtol=1e-6)
    y = np.random.default_rng(1).standard_normal((48, 4, 4)) * 500 + 1000
    z2 = standardize_houston2018(y)
    assert z2.shape == y.shape
    assert abs(z2.mean()) < 50  # scaled down


def test_max_normalize():
    x = np.ones((200, 2, 2), np.float32) * 100
    out = max_normalize_enmap(x)
    assert out.shape == x.shape and (out <= 1).all() and (out > 0).all()
    np.testing.assert_allclose(max_normalize_all_bands_same(x), x / 25000.0)


def test_export_import_roundtrip():
    """export_vit_spatial_spectral is the exact inverse of the importer."""
    import jax
    import jax.numpy as jnp

    from maskedsst_tpu.io.torch_import import (
        export_vit_spatial_spectral,
        import_vit_spatial_spectral,
    )
    from maskedsst_tpu.models import ViTSpatialSpectral

    model = ViTSpatialSpectral(
        image_size=4, spatial_patch_size=1, spectral_patch_size=10, num_classes=3,
        dim=24, depth=2, heads=2, dim_head=8, mlp_dim=16, channels=20,
        spectral_pos=[0, 1],
    )
    x = jnp.zeros((1, 20, 4, 4))
    params = model.init(jax.random.PRNGKey(0), x, deterministic=True)["params"]
    sd = export_vit_spatial_spectral(params, model)
    back = import_vit_spatial_spectral(sd, model)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    for path, val in flat_a:
        np.testing.assert_allclose(
            np.asarray(val), np.asarray(flat_b[path]), rtol=1e-6, err_msg=str(path)
        )


def test_enmap_pixel_location_mode(tmp_path, monkeypatch):
    from maskedsst_tpu.data import enmap as enmap_mod

    rng = np.random.default_rng(0)
    tile = rng.standard_normal((200, 64, 64)).astype(np.float32)
    locations = {
        0: [("fake.tif", (rng.integers(5, 58), rng.integers(5, 58))) for _ in range(30)],
        1: [("fake.tif", (rng.integers(5, 58), rng.integers(5, 58))) for _ in range(30)],
    }
    loc_file = tmp_path / "locs.pkl"
    with open(loc_file, "wb") as f:
        pickle.dump(locations, f)

    monkeypatch.setattr(
        enmap_mod.EnMAPWorldCoverDataset, "_load_img", lambda self, p: tile
    )
    train_dir = tmp_path / "train"
    train_dir.mkdir()
    ds = enmap_mod.EnMAPWorldCoverDataset(
        str(train_dir), target_type="dfc", pixel_location_file=str(loc_file),
        num_samples_per_class=5, patch_size=3, patch_offset=0,
    )
    assert len(ds) == 10
    s = ds[0]
    assert s["img"].shape == (200, 3, 3)
    assert s["label"] in (0, 1)
