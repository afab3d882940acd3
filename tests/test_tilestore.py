"""Packed tile store tests: pack→read roundtrip, native-vs-numpy gather
parity, fused standardization, cropping, dataset interface."""

import numpy as np
import pytest

from maskedsst_tpu.data.synthetic import SyntheticCubeDataset
from maskedsst_tpu.native import PackedTileStore, native_available, pack_tiles


@pytest.fixture(scope="module")
def store_path(tmp_path_factory):
    ds = SyntheticCubeDataset(num_tiles=12, n_bands=6, tile_size=16, n_classes=4)
    path = str(tmp_path_factory.mktemp("store") / "tiles.msts")
    pack_tiles(ds, path)
    return path, ds


def test_native_builds():
    # the image ships g++; if this fails the fallback still works but we want
    # to know the native path is exercised in CI
    assert native_available(), "native tile store failed to build"


def test_roundtrip(store_path):
    path, ds = store_path
    store = PackedTileStore(path)
    assert len(store) == 12
    assert (store.bands, store.height, store.width) == (6, 16, 16)
    assert store.has_labels
    for i in (0, 5, 11):
        np.testing.assert_array_equal(store.gather([i])[0], ds[i]["img"])
        np.testing.assert_array_equal(store.gather_labels([i])[0], ds[i]["label"])


def test_native_matches_numpy_fallback(store_path):
    path, _ = store_path
    store = PackedTileStore(path)
    idx = [3, 0, 7, 7, 11]
    native = store.gather(idx)
    # force the fallback
    handle, store._handle = store._handle, None
    fallback = store.gather(idx)
    store._handle = handle
    np.testing.assert_array_equal(native, fallback)


def test_standardize_fused(store_path):
    path, _ = store_path
    mean = np.linspace(-1, 1, 6).astype(np.float32)
    std = np.linspace(0.5, 2.0, 6).astype(np.float32)
    store = PackedTileStore(path, standardize=(mean, std))
    raw = PackedTileStore(path)
    got = store.gather([2, 4])
    want = (raw.gather([2, 4]) - mean[:, None, None]) / std[:, None, None]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gather_crop(store_path):
    path, _ = store_path
    store = PackedTileStore(path)
    idx = [1, 2]
    xs, ys = [3, 0], [5, 8]
    crops = store.gather_crop(idx, xs, ys, 8)
    full = store.gather(idx)
    for i in range(2):
        np.testing.assert_array_equal(
            crops[i], full[i, :, xs[i] : xs[i] + 8, ys[i] : ys[i] + 8]
        )


def test_out_of_range_index_fallback(store_path):
    path, _ = store_path
    store = PackedTileStore(path)
    with pytest.raises(IndexError):
        store.gather([999])
    # NEGATIVE indices must raise too: the numpy fallback's wraparound
    # would silently return the LAST tile for inputs the native rejects
    with pytest.raises(IndexError):
        store.gather([-1])
    with pytest.raises(IndexError):
        store.gather_labels([-1])
    with pytest.raises(IndexError):
        store.gather_crop([0], [-3], [0], 4)
    with pytest.raises(IndexError):
        store.gather_crop([0], [0], [store.width - 2], 4)  # y+size > width


def test_dataset_interface_plugs_into_pipeline(store_path):
    path, _ = store_path
    from maskedsst_tpu.data.pipeline import DataLoader, split_dataset

    store = PackedTileStore(path)
    val, train = split_dataset(store, 0.75, seed=5)
    dl = DataLoader(train, 4, shuffle=True, prefetch=0)
    batch = next(iter(dl))
    assert batch["img"].shape == (4, 6, 16, 16)
    assert batch["label"].shape == (4, 16, 16)
