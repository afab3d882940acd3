"""Unit tests for the pure-numpy ETL primitives (the rasterio/shapely IO
around them is host-only and gated on those libraries being installed).

Oracle for the majority-vote downsample: a direct transcription of the
reference's per-pixel np.unique loop (enmap_data/create_enmap_dfc_dataset.py
:25-41) — sorted-unique argmax resolves ties toward the smallest label.
"""

import numpy as np

from maskedsst_tpu.etl.create_enmap_dataset import cut_tiles
from maskedsst_tpu.etl.create_enmap_dfc_dataset import (
    cut_aligned_tiles,
    downsample_majority,
)


def _reference_downsample(data, factor=3):
    out = np.zeros((data.shape[0] // factor, data.shape[1] // factor))
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            v, c = np.unique(
                data[factor * i : factor * i + factor, factor * j : factor * j + factor],
                return_counts=True,
            )
            out[i, j] = v[np.argmax(c)]
    return out


def test_downsample_majority_matches_reference_loop():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 11, size=(31, 29)).astype(np.int32)  # odd sizes: trailing rows dropped
    got = downsample_majority(data, factor=3)
    want = _reference_downsample(data, factor=3)
    np.testing.assert_array_equal(got, want.astype(got.dtype))
    assert got.shape == (10, 9)


def test_downsample_majority_tie_break_smallest_label():
    # 2x2 window with two values tied 2-2 -> smallest label wins (np.unique order)
    data = np.array([[5, 2], [2, 5]], np.int32)
    assert downsample_majority(data, factor=2)[0, 0] == 2


def test_cut_tiles_drops_all_nodata():
    raster = np.zeros((4, 128, 128), np.float32)
    raster[:, :64, :64] = -32768.0  # top-left tile entirely nodata
    raster[0, 70, 70] = 3.0
    tiles = cut_tiles(raster, tile_size=64, nodata=-32768.0)
    assert len(tiles) == 3  # 2x2 grid minus the nodata tile


def test_cut_aligned_tiles_alignment_and_filters():
    rng = np.random.default_rng(1)
    enmap = rng.standard_normal((4, 128, 128)).astype(np.float32)
    dfc = rng.integers(1, 5, size=(1, 384, 384)).astype(np.int32)
    # poison one label tile with nodata -> that pair must be dropped
    dfc[0, 0, 0] = 0
    tiles = cut_aligned_tiles(enmap, dfc, enmap_nodata=-32768.0, dfc_nodata=0)
    assert len(tiles) == 3
    et, lt = tiles[0]
    assert et.shape == (4, 64, 64) and lt.shape == (192, 192)
    # alignment: with the top-left pair dropped, the first surviving tile is
    # the top-right block
    np.testing.assert_array_equal(et, enmap[:, 0:64, 64:128])


def test_cut_aligned_tiles_label_windows_match_positions():
    enmap = np.arange(2 * 128 * 128, dtype=np.float32).reshape(2, 128, 128)
    dfc = np.arange(384 * 384, dtype=np.int64).reshape(1, 384, 384) + 1  # avoid nodata 0
    tiles = cut_aligned_tiles(enmap, dfc, enmap_nodata=-1.0, dfc_nodata=0)
    assert len(tiles) == 4
    positions = [(0, 0), (0, 64), (64, 0), (64, 64)]
    for (i, j), (et, lt) in zip(positions, tiles):
        np.testing.assert_array_equal(et, enmap[:, i : i + 64, j : j + 64])
        np.testing.assert_array_equal(
            lt, dfc[0, i * 3 : (i + 64) * 3, j * 3 : (j + 64) * 3]
        )


# --- full-driver runs against a fake rasterio/shapely API boundary ----------
#
# rasterio/GDAL is not installable in this image, so a real GeoTIFF cannot be
# written; instead the two ETL __main__ drivers run END TO END (globbing,
# manifests, split routing, mosaic writes, window matching, aligned tiling,
# majority downsample, per-tile writes) against minimal in-memory fakes of
# exactly the rasterio/shapely surface they touch. Arrays round-trip through
# the fake writer/reader, so every numeric path executes for real.

import os
import sys
import types


class _FakeTransform:
    """Pixel grid: (origin_x, origin_y_top, pixel_size); y grows downward."""

    def __init__(self, x0, y1, px):
        self.x0, self.y1, self.px = x0, y1, px


class _Window:
    def __init__(self, row0, col0, rows, cols):
        self.row0, self.col0, self.rows, self.cols = row0, col0, rows, cols


class _FakeDataset:
    def __init__(self, path):
        with open(path, "rb") as f:
            payload = np.load(f, allow_pickle=True).item()
        self.arr = payload["arr"]
        self.meta = payload["meta"]
        self.transform = payload["transform"]
        self.count, self.height, self.width = self.arr.shape
        self.crs = self.meta.get("crs")

    @property
    def bounds(self):
        t = self.transform
        return (t.x0, t.y1 - self.height * t.px, t.x0 + self.width * t.px, t.y1)

    def read(self, out_shape=None, resampling=None, window=None):
        arr = self.arr
        if window is not None:
            arr = arr[
                :,
                window.row0 : window.row0 + window.rows,
                window.col0 : window.col0 + window.cols,
            ]
        if out_shape is not None and out_shape != arr.shape:
            c, h, w = out_shape
            fy, fx = h // arr.shape[1], w // arr.shape[2]
            arr = np.repeat(np.repeat(arr, fy, axis=1), fx, axis=2)
        return arr

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _FakeWriter:
    def __init__(self, path, meta):
        self.path, self.meta = path, meta

    def write(self, arr):
        meta = dict(self.meta)
        transform = meta.pop("transform", _FakeTransform(0.0, float(arr.shape[1]), 1.0))
        with open(self.path, "wb") as f:
            np.save(
                f,
                {"arr": np.asarray(arr), "meta": meta, "transform": transform},
                allow_pickle=True,
            )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _write_fake_tif(path, arr, nodata, crs="EPSG:32614", x0=0.0, y1=None, px=1.0):
    meta = {"nodata": nodata, "crs": crs, "driver": "GTiff", "count": arr.shape[0],
            "height": arr.shape[1], "width": arr.shape[2], "dtype": arr.dtype}
    t = _FakeTransform(x0, float(arr.shape[1]) * px if y1 is None else y1, px)
    _FakeWriter(path, {**meta, "transform": t}).write(arr)


def _install_fake_geo(monkeypatch):
    rio = types.ModuleType("rasterio")

    def _open(path, mode="r", **meta):
        return _FakeDataset(path) if mode == "r" else _FakeWriter(path, meta)

    rio.open = _open

    merge_mod = types.ModuleType("rasterio.merge")

    def _merge(datasets):
        assert len(datasets) == 1, "fake merge supports single-product mosaics"
        d = datasets[0]
        return d.arr.copy(), d.transform

    merge_mod.merge = _merge
    rio.merge = merge_mod

    windows_mod = types.ModuleType("rasterio.windows")

    def _from_bounds(left, bottom, right, top, transform):
        px = transform.px
        col0 = int(round((left - transform.x0) / px))
        row0 = int(round((transform.y1 - top) / px))
        return _Window(row0, col0, int(round((top - bottom) / px)), int(round((right - left) / px)))

    windows_mod.from_bounds = _from_bounds
    rio.windows = windows_mod

    warp_mod = types.ModuleType("rasterio.warp")
    warp_mod.Resampling = types.SimpleNamespace(bilinear="bilinear")
    rio.warp = warp_mod

    shapely_mod = types.ModuleType("shapely")
    geometry_mod = types.ModuleType("shapely.geometry")

    class _Box:
        def __init__(self, l, b, r, t):
            self.bounds = (l, b, r, t)

        def intersection(self, other):
            l1, b1, r1, t1 = self.bounds
            l2, b2, r2, t2 = other.bounds
            return _Box(max(l1, l2), max(b1, b2), min(r1, r2), min(t1, t2))

    geometry_mod.box = lambda l, b, r, t: _Box(l, b, r, t)
    shapely_mod.geometry = geometry_mod

    for name, mod in [
        ("rasterio", rio), ("rasterio.merge", merge_mod),
        ("rasterio.windows", windows_mod), ("rasterio.warp", warp_mod),
        ("shapely", shapely_mod), ("shapely.geometry", geometry_mod),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)


def _product_tree(root, name="ENMAP01-____L2A-DT0000001"):
    d = os.path.join(root, "a", "b", "c", name)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{name}-SPECTRAL_IMAGE.TIF")


def test_enmap_etl_driver_end_to_end(tmp_path, monkeypatch, capsys):
    """create_enmap_dataset.main(): product walk -> read -> tile -> nodata
    drop -> train/test routing by manifest -> per-tile writes -> skip-on-
    rerun, through the real rasterio call sequence."""
    import maskedsst_tpu.etl.create_enmap_dataset as etl

    _install_fake_geo(monkeypatch)
    rng = np.random.default_rng(0)
    raster = rng.standard_normal((3, 128, 128)).astype(np.float32)
    raster[:, :64, :64] = -32768.0  # one all-nodata tile -> 3 survive
    train_product = _product_tree(str(tmp_path / "enmap"))
    _write_fake_tif(train_product, raster, nodata=-32768.0)
    test_product = _product_tree(str(tmp_path / "enmap"), "ENMAP01-____L2A-DT0000002")
    _write_fake_tif(test_product, raster, nodata=-32768.0)

    manifest = tmp_path / "testfiles.txt"
    manifest.write_text(os.path.basename(test_product).split(".TIF")[0] + "\n")
    out = tmp_path / "tiles" / "train"
    monkeypatch.setattr(sys, "argv", [
        "etl", "--enmap-path", str(tmp_path / "enmap"),
        "--output-dir", str(out), "--testfiles", str(manifest),
    ])
    etl.main()

    train_tiles = sorted((out / os.path.basename(train_product).split(".TIF")[0]).iterdir())
    test_dir = tmp_path / "tiles" / "test" / os.path.basename(test_product).split(".TIF")[0]
    assert len(train_tiles) == 3 and len(list(test_dir.iterdir())) == 3
    # tile content round-trips through the writer exactly
    wrote = _FakeDataset(str(train_tiles[0])).arr
    np.testing.assert_array_equal(wrote, raster[:, :64, 64:128])

    capsys.readouterr()
    etl.main()  # rerun: both products skip
    assert capsys.readouterr().out.count("already processed") == 2


def test_enmap_dfc_etl_driver_end_to_end(tmp_path, monkeypatch):
    """create_enmap_dfc_dataset.main(): mosaic writes, bounds intersection,
    aligned 64/192 tiling, test-id routing, and the 30 m majority-downsample
    sidecars, through the real rasterio/shapely call sequence."""
    import maskedsst_tpu.etl.create_enmap_dfc_dataset as etl

    _install_fake_geo(monkeypatch)
    rng = np.random.default_rng(1)
    # EnMAP 128x128 @ 1 px; DFC 384x384 @ 1/3 px over the same extent
    enmap = rng.standard_normal((3, 128, 128)).astype(np.float32)
    labels = rng.integers(1, 6, size=(1, 384, 384)).astype(np.int32)
    pid = "ENMAP01-____L2A-DT0000003"
    _write_fake_tif(_product_tree(str(tmp_path / "enmap"), pid), enmap, nodata=-32768.0)
    dfc_dir = tmp_path / "dfc" / "DFC_Public_Dataset" / "ROIs0000_winter" / "dfc_MexicoCity"
    os.makedirs(dfc_dir)
    _write_fake_tif(str(dfc_dir / "roi.tif"), labels, nodata=0, px=1.0 / 3.0)

    test_ids = tmp_path / "test_ids.txt"
    test_ids.write_text("1\n")
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "etl", "--dfc-path", str(tmp_path / "dfc"),
        "--enmap-path", str(tmp_path / "enmap"), "--output-dir", str(out),
        "--enmap-ids", pid, "--test-ids", str(test_ids),
    ])
    etl.main()

    assert (out / "enmap.tif").exists() and (out / "dfc.tif").exists()
    train, test = out / "train", out / "test"
    assert sorted(p.name for p in test.iterdir()) == [
        "tile1_dfc.tif", "tile1_dfc_30m.tif", "tile1_enmap.tif",
    ]
    assert len(list(train.iterdir())) == 3 * 3  # 4 tiles total, one held out
    # label tile and its 30 m sidecar agree with the direct computation
    lt = _FakeDataset(str(test / "tile1_dfc.tif")).arr[0]
    np.testing.assert_array_equal(lt, labels[0, 0:192, 192:384])
    low = _FakeDataset(str(test / "tile1_dfc_30m.tif")).arr[0]
    np.testing.assert_array_equal(low, downsample_majority(lt, 3))
