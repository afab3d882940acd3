"""Config system: two-file YAML merge with attribute access.

Reproduces the reference semantics (src/utils.py:316-429): a task YAML
(pretrain/finetune) is merged with the shared ``config.yaml`` sections
``data[dataset]``, ``transformer`` and (for pretraining) ``masked_modeling``,
last write wins. The result is an attribute-access object that may be mutated
freely at runtime (run_id, model_params, patch_sub, spectral_pos, ...), so the
reference ``configs/*.yaml`` files drop in unchanged.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import numpy as np
import yaml

# Repo root = parent of the maskedsst_tpu package (holds configs/).
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class Config:
    """Attribute-access dict (reference ``Dotdict``, src/utils.py:332-334).

    Unlike the reference it also supports ``.get``, ``in``, ``to_dict`` and
    deep-copy, which the trainers use for checkpoint metadata.
    """

    def __init__(self, data: Optional[Dict[str, Any]] = None, **kwargs):
        if data:
            self.__dict__.update(data)
        self.__dict__.update(kwargs)

    def get(self, key: str, default: Any = None) -> Any:
        return self.__dict__.get(key, default)

    def to_dict(self) -> Dict[str, Any]:
        return dict(self.__dict__)

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.__dict__))

    def __contains__(self, key: str) -> bool:
        return key in self.__dict__

    def __repr__(self) -> str:
        items = ", ".join(f"{k}={v!r}" for k, v in sorted(self.__dict__.items()))
        return f"Config({items})"

    def __eq__(self, other) -> bool:
        return isinstance(other, Config) and self.__dict__ == other.__dict__


def _load_yaml(path: str) -> Dict[str, Any]:
    # Relative config paths (the drivers' "configs/..." defaults) resolve
    # against the cwd first, then fall back to the repo root so the CLIs work
    # from any directory (the reference is cwd-only, src/utils.py:317-321).
    if not os.path.isabs(path) and not os.path.exists(path):
        rooted = os.path.join(_REPO_ROOT, path)
        if os.path.exists(rooted):
            path = rooted
    with open(path, "r") as f:
        return yaml.safe_load(f)


def _merge(task: Dict[str, Any], general: Dict[str, Any], *, masked_modeling: bool) -> Dict[str, Any]:
    """Last-write-wins merge of the shared config sections into the task config
    (reference src/utils.py:323-325)."""
    merged = dict(task)
    merged.update(general["data"][task["dataset"]])
    merged.update(general["transformer"])
    if masked_modeling:
        merged.update(general["masked_modeling"])
    return merged


def get_pretrain_config(
    pretrain_config_path: str,
    general_config_path: str,
    seed: int = 5,
    device: Any = None,
) -> Config:
    """Reference ``get_pretrain_config`` (src/utils.py:316-329)."""
    hyper = _merge(
        _load_yaml(pretrain_config_path),
        _load_yaml(general_config_path),
        masked_modeling=True,
    )
    hyper["seed"] = seed
    hyper["device"] = device
    return Config(hyper)


def get_finetune_config(
    finetune_config_path: str,
    general_config_path: str,
    seed: int = 5,
    device: Any = None,
) -> Config:
    """Reference ``get_finetune_config`` (src/utils.py:337-364).

    Derives ``spectral_pos`` (wavelength-matched for houston2018) and
    ``patch_sub`` (1 when pixelwise with an even image size so a center pixel
    exists).
    """
    hyper = _merge(
        _load_yaml(finetune_config_path),
        _load_yaml(general_config_path),
        masked_modeling=False,
    )
    hyper["seed"] = seed
    hyper["device"] = device

    if hyper["method_name"] == "li":
        assert hyper["pixelwise"], "the li baseline predicts a single center pixel"
    elif hyper["method_name"] == "ViTSpatialSpectral":
        hyper["spectral_pos"] = get_spectral_pos(
            hyper["dataset"], hyper["n_bands"], hyper["band_patch_size"]
        )

    if hyper["pixelwise"] and hyper["image_size"] % 2 == 0:
        hyper["patch_sub"] = 1
    else:
        hyper["patch_sub"] = 0

    return Config(hyper)


def rederive_finetune_config(config: Config) -> Config:
    """Recompute the DERIVED finetune fields (``spectral_pos``,
    ``patch_sub``, the li pixelwise invariant) after sweep/CLI overrides —
    the reference re-derives spectral_pos after overlaying ``wandb.config``
    (src/utils.py:381-388); without this, sweeping e.g. band_patch_size
    leaves a stale spectral_pos length."""
    if config.method_name == "li":
        assert config.pixelwise, "the li baseline predicts a single center pixel"
    elif config.method_name == "ViTSpatialSpectral":
        config.spectral_pos = get_spectral_pos(
            config.dataset, config.n_bands, config.band_patch_size
        )
    config.patch_sub = 1 if (config.pixelwise and config.image_size % 2 == 0) else 0
    return config


def verify_sweep_params(hyperparams: Dict[str, Any]) -> Dict[str, Any]:
    """Coerce string booleans coming from a sweep controller
    (reference ``verify_sweep_params``, src/utils.py:222-273)."""
    falsy = [False, "false", "False"]

    def as_bool(key: str, allow_none: bool = False, required: bool = False) -> bool:
        if required:
            # reference indexes these keys directly — fail fast (KeyError) on
            # a sweep config that omits them instead of silently treating the
            # absence as True (src/utils.py:229,254,259)
            return hyperparams[key] not in falsy
        val = hyperparams.get(key)
        if allow_none:  # absent/None → False (reference :244-252)
            return val not in falsy + [None]
        return val not in falsy  # absent → True (reference :234-242)

    checkpoint_path = hyperparams["checkpoint_path"]
    if checkpoint_path in ["none", "None"]:
        checkpoint_path = None

    return {
        "checkpoint_path": checkpoint_path,
        "linear_eval": as_bool("linear_eval", required=True),
        "spectral_pos_embed": as_bool("spectral_pos_embed"),
        "blockwise_patch_embed": as_bool("blockwise_patch_embed"),
        "spectral_only": as_bool("spectral_only", allow_none=True),
        "pixelwise": as_bool("pixelwise", allow_none=True),
        "shifting_window": as_bool("shifting_window", required=True),
        "overwrite_li_optim": as_bool("overwrite_li_optim", required=True),
    }


def match_wavelengths_to_reference(
    spectral_patch_depth: int,
    wavelengths,
    reference_wavelengths,
) -> list:
    """For each spectral block of ``wavelengths``, index of the closest block
    (by mean wavelength) in ``reference_wavelengths``.

    Enables cross-sensor transfer of spectral positional embeddings
    (reference ``get_pos_for_spectral_embedding``,
    src/vit_spatial_spectral.py:767-800). Blocks are windows of
    ``spectral_patch_depth`` consecutive bands; a trailing partial block uses
    the mean of the remaining bands, exactly as the reference's
    ``wavelengths[i:i+depth].mean()`` does for a short tail.
    """
    wavelengths = np.asarray(wavelengths, dtype=np.float64)
    reference_wavelengths = np.asarray(reference_wavelengths, dtype=np.float64)

    def block_means(waves: np.ndarray) -> np.ndarray:
        total = len(waves)
        if total % spectral_patch_depth != 0:
            total += spectral_patch_depth - total % spectral_patch_depth
        return np.array(
            [waves[i : i + spectral_patch_depth].mean() for i in range(0, total, spectral_patch_depth)]
        )

    means = block_means(wavelengths)
    ref_means = block_means(reference_wavelengths)
    return [int(np.argmin(np.abs(ref_means - m))) for m in means]


def get_spectral_pos(dataset: str, n_bands: int, band_patch_size: int) -> list:
    """Spectral block positions for the positional embedding
    (reference ``get_spectral_pos_embedding``, src/utils.py:415-429).

    EnMAP-family datasets use the identity ``arange``; Houston2018 maps each
    of its spectral blocks onto the nearest EnMAP block by wavelength so a
    model pre-trained on EnMAP transfers its spectral embeddings.
    """
    if dataset in ("worldcover", "dfc", "enmap"):
        return list(range(n_bands // band_patch_size))
    if dataset == "houston2018":
        from maskedsst_tpu.data.constants import (
            ENMAP_WAVELENGTHS,
            ENMAP_INVALID_L2_BANDS,
            HOUSTON2018_WAVELENGTHS,
        )

        valid_enmap = np.asarray(ENMAP_WAVELENGTHS)[~np.asarray(ENMAP_INVALID_L2_BANDS)]
        return match_wavelengths_to_reference(
            band_patch_size, HOUSTON2018_WAVELENGTHS, valid_enmap
        )
    raise NotImplementedError(f"Unknown dataset {dataset=}")
