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
