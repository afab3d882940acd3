"""EnMAP WorldCover / DFC dataset (reference src/data_enmap.py:146-310).

Reads 64x64x224-band GeoTIFF tiles via rasterio, drops the 22 invalid L2
bands plus configured ``remove_bands`` (→ 200 bands), standardizes band-wise,
clips to (-200, 10000) in raw units before standardization order — note the
reference clips AFTER standardization numerically? No: it standardizes inside
``transforms`` at load and clips the already-transformed tensor at __getitem__
(src/data_enmap.py:302-304) with the raw-unit bounds, which at standardized
scale is almost always a no-op; we reproduce that behavior exactly.

Labels come from sibling ``*{target}_30m.tif`` rasters through the
WorldCover/DFC label transforms. ``rgb_only`` selects bands (199, 150, 0).

Requires rasterio; import of this module is cheap and the dependency is only
touched on first read.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import numpy as np

from maskedsst_tpu.data import constants as C
from maskedsst_tpu.data.transforms import (
    dfc_label_transform,
    standardize_enmap,
    worldcover_label_transform,
)


def _require_rasterio():
    try:
        import rasterio  # noqa: F401

        return rasterio
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "rasterio is required for real EnMAP tiles; use "
            "maskedsst_tpu.data.synthetic for dataset-free runs"
        ) from exc


class EnMAPWorldCoverDataset:
    """Returns ``{"img": float32 [200, 64, 64], "label": int64 [64, 64],
    "idx": int}`` (label omitted for target_type='unlabeled')."""

    def __init__(
        self,
        path: str,
        target_type: str = "worldcover",
        remove_bands: Sequence[int] = (),
        test: bool = False,
        load_to_memory: bool = False,
        clip: Optional[tuple] = (-200, 10000),
        rgb_only: bool = False,
        standardize: bool = True,
        pixel_location_file: Optional[str] = None,
        num_samples_per_class: Optional[int] = None,
        patch_size: int = 3,
        patch_offset: int = 100,
        shuffle_samples: bool = False,
        seed: int = 0,
    ):
        assert target_type in ("worldcover", "dfc", "unlabeled"), target_type
        # split sanity (reference src/data_enmap.py:203-206)
        if test:
            assert "test" in path, f"test split expected a 'test' path: {path}"
        else:
            assert "train" in path, f"train split expected a 'train' path: {path}"
        self.path = path
        self.target_type = target_type
        self.invalid_band_idxs = list(C.ENMAP_INVALID_BAND_IDXS) + list(remove_bands)
        self.clip = clip
        self.rgb_only = rgb_only
        self.standardize = standardize
        self.load_to_memory = load_to_memory

        if target_type in ("worldcover", "unlabeled"):
            # exclude '<product>.tmp<pid>' staging dirs a crashed ETL run may
            # have left behind (etl/create_enmap_dataset.py writes products
            # atomically via rename; partial tiles must never be trained on)
            self.enmap_files = sorted(
                f
                for f in glob.glob(os.path.join(path, "*", "*enmap.tif"))
                if ".tmp" not in os.path.basename(os.path.dirname(f))
            )
        else:  # dfc tiles sit flat in the directory
            self.enmap_files = sorted(glob.glob(os.path.join(path, "*enmap.tif")))
        self.target_files = [
            f.replace("enmap.tif", f"{target_type}_30m.tif") for f in self.enmap_files
        ]
        if target_type == "unlabeled":
            self.target_files = None

        # pixel-location sampling mode (reference src/data_enmap.py:172-201,
        # 268-293): a pickled {class: [(tif_path, (x, y)), ...]} file selects
        # num_samples_per_class center pixels per class; patches of
        # ``patch_size`` around them are preloaded to memory.
        self.patch_size = patch_size
        self.patches: list = []
        self.patch_labels: list = []
        # dispatch on the MODE, not on patch-list truthiness: zero kept
        # patches must stay a (loud) empty dataset, not silently fall back
        # to full-tile mode (the reference's len(patches)==0 is visible)
        self.pixel_mode = pixel_location_file is not None
        if pixel_location_file is not None:
            import pickle
            import random as _random

            assert num_samples_per_class and 0 < num_samples_per_class < 6172
            with open(pixel_location_file, "rb") as handle:
                pixel_locations = pickle.load(handle)
            if shuffle_samples:
                rng = _random.Random(seed)
                for key in list(pixel_locations.keys()):
                    rng.shuffle(pixel_locations[key])
            prev_file, img = "", None
            for cls, locs in pixel_locations.items():
                kept = []
                while len(kept) != num_samples_per_class and len(locs) > patch_offset:
                    tup = locs.pop(patch_offset)
                    x, y = tup[1]
                    # skip border pixels so patches stay inside the tile
                    if patch_size < x < 64 - patch_size and patch_size < y < 64 - patch_size:
                        kept.append(tup)
                if len(kept) < num_samples_per_class:
                    print(
                        f"[enmap] WARNING: class {cls} has only {len(kept)} "
                        f"usable pixel locations (< {num_samples_per_class}) "
                        "— the sampled set is class-imbalanced"
                    )
                for tif, (x, y) in kept:
                    if tif != prev_file:
                        img = self._load_img(tif)
                        prev_file = tif
                    half = patch_size // 2
                    # .copy(): a view would pin the WHOLE ~3 MB source tile
                    # in memory per kept patch (sparse sampling over many
                    # tiles → GBs resident for MBs of patch data)
                    self.patches.append(
                        img[:, x - half : x + half + 1, y - half : y + half + 1].copy()
                    )
                    self.patch_labels.append(cls)

        self._cache = {}
        if load_to_memory and not self.pixel_mode:
            # pixel mode is already fully in memory (self.patches); the
            # tile-indexed preload below would index enmap_files by PATCH
            # index — IndexError (more patches than tiles) or a full-tile
            # cache __getitem__ never consults
            for i in range(len(self)):
                self._cache[i] = self._load(i)

    def __len__(self) -> int:
        if self.pixel_mode:
            return len(self.patches)
        return len(self.enmap_files)

    def _load_img(self, path: str) -> np.ndarray:
        rio = _require_rasterio()
        with rio.open(path, num_threads=4) as f:
            keep = [b for b in f.indexes if b - 1 not in self.invalid_band_idxs]
            img = f.read(keep).astype(np.float32)
        if self.standardize:
            img = standardize_enmap(img).astype(np.float32)
        if self.rgb_only:
            img = img[[199, 150, 0]]
        return img

    def _load_label(self, path: str) -> np.ndarray:
        rio = _require_rasterio()
        with rio.open(path) as f:
            label = f.read()[0]
        if self.target_type == "worldcover":
            return worldcover_label_transform(label)
        return dfc_label_transform(label)

    def _load(self, idx: int) -> dict:
        img = self._load_img(self.enmap_files[idx])
        sample = {"idx": idx, "img": img}
        if self.target_files is not None:
            sample["label"] = self._load_label(self.target_files[idx])
        return sample

    def __getitem__(self, idx: int) -> dict:
        if self.pixel_mode:
            img = self.patches[idx]
            if self.clip is not None:
                img = np.clip(img, self.clip[0], self.clip[1])
            sample = {"idx": idx, "img": img}
            if self.target_type != "unlabeled":
                sample["label"] = np.int64(self.patch_labels[idx])
            return sample
        sample = dict(self._cache[idx]) if idx in self._cache else self._load(idx)
        if self.clip is not None:
            sample["img"] = np.clip(sample["img"], self.clip[0], self.clip[1])
        return sample
