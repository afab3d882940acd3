"""Import the upstream PyTorch reference (read-only at /root/reference) as a
numerical oracle for parity tests. Nothing from the reference is vendored into
the framework — tests call it to produce state dicts and golden outputs.

Skipped automatically when the reference tree or torch is unavailable.
"""

import sys

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"


def load_reference():
    """Returns the reference modules (vit_spatial_spectral, vit_simmim_original,
    pos_embed) or skips the calling test."""
    if REFERENCE_PATH not in sys.path:
        # APPEND, not insert(0): the reference tree also contains finetune.py/
        # pretrain.py etc. which would otherwise shadow this repo's drivers
        # for any test that imports them after an oracle test ran
        sys.path.append(REFERENCE_PATH)
    if not hasattr(np, "float"):
        np.float = float  # reference pos_embed.py uses the removed alias
    try:
        import torch  # noqa: F401
        from src import pos_embed as ref_pos_embed
        from src import vit_spatial_spectral as ref_vss
        from src import vit_simmim_original as ref_simmim
        from src import vit_original as ref_vit_original
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference oracle unavailable: {exc}")
    return ref_pos_embed, ref_vss, ref_simmim, ref_vit_original


def load_reference_hyperx():
    """Returns the reference DeepHyperX.models module or skips the test.

    DeepHyperX.models does ``from .utils import ...`` which would pull visdom;
    a stub utils module satisfies the import without it."""
    import types

    if REFERENCE_PATH not in sys.path:
        sys.path.append(REFERENCE_PATH)  # see load_reference
    if "DeepHyperX.models" not in sys.modules:
        utils_stub = types.ModuleType("DeepHyperX.utils")
        for fn in ("grouper", "sliding_window", "count_sliding_window", "camel_to_snake"):
            setattr(utils_stub, fn, lambda *a, **k: None)
        pkg = types.ModuleType("DeepHyperX")
        pkg.__path__ = [f"{REFERENCE_PATH}/DeepHyperX"]
        sys.modules.setdefault("DeepHyperX", pkg)
        sys.modules["DeepHyperX.utils"] = utils_stub
    try:
        import torch  # noqa: F401
        from DeepHyperX import models as ref_models
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference DeepHyperX unavailable: {exc}")
    return ref_models
