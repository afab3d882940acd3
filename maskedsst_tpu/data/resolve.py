"""Dataset resolution for the drivers (reference get_unsupervised_data /
get_supervised_data, src/utils.py:62-219): build the dataset named by the
config, falling back to synthetic cubes when requested or when the real
rasters / geo libraries are unavailable (they are license-gated,
reference readme.md:18-20)."""

from __future__ import annotations

import os

from maskedsst_tpu.config import Config
from maskedsst_tpu.data.synthetic import SyntheticCubeDataset


def _geo_available() -> bool:
    try:
        import rasterio  # noqa: F401

        return True
    except ImportError:
        return False


def get_dataset(config: Config, *, supervised: bool, synthetic: bool = False):
    """Dataset for the config's ``dataset`` name.

    synthetic=True (or missing data/libs with a warning) → SyntheticCubeDataset
    with the right band/class counts.
    """
    train_path = str(config.get("train_path", ""))
    # packed native tile store (.msts) — fastest host path, no geo libs needed
    if not synthetic and train_path.endswith(".msts") and os.path.exists(train_path):
        from maskedsst_tpu.native import PackedTileStore

        store = PackedTileStore(train_path)
        if supervised and not store.has_labels:
            # fail at resolution, not with a KeyError deep in the train loop
            raise ValueError(
                f"{train_path} is an UNLABELED tile store (packed from a "
                "pretraining dataset); the supervised path needs labels"
            )
        return store

    have_real = (
        not synthetic
        and _geo_available()
        and os.path.exists(train_path)
    )
    if not have_real:
        if not synthetic:
            print(
                "[maskedsst_tpu] real dataset unavailable "
                f"(path={config.get('train_path')!r}); using synthetic cubes"
            )
        return SyntheticCubeDataset(
            num_tiles=int(config.get("synthetic_tiles", 512)),
            n_bands=config.n_bands,
            n_classes=config.n_classes,
            labeled=supervised,
            seed=config.get("seed", 5),
        )

    if config.dataset in ("dfc", "enmap", "worldcover"):
        from maskedsst_tpu.data.enmap import EnMAPWorldCoverDataset

        target_type = "unlabeled" if not supervised else (
            "dfc" if config.dataset == "dfc" else "worldcover"
        )
        return EnMAPWorldCoverDataset(
            config.train_path,
            target_type=target_type,
            remove_bands=config.get("remove_bands", []),
            rgb_only=config.get("rgb_only", False),
        )
    if config.dataset == "houston2018":
        from maskedsst_tpu.data.houston2018 import Houston2018Dataset

        return Houston2018Dataset(
            config.train_path,
            config.train_label_path,
            patch_size=config.image_size - config.get("patch_sub", 0),
            test=False,
            drop_unlabeled=supervised,
            fix_train_patches=False,
            pixelwise=config.get("pixelwise", False) if supervised else False,
            rgb_only=config.get("rgb_only", False),
        )
    raise NotImplementedError(f"unknown dataset {config.dataset!r}")
