"""Normalization and label transforms as pure numpy functions.

Reference classes (src/data_enmap.py:312-585, src/data_houston2018.py:332-465)
are callables over numpy/torch arrays; here they are stateless functions.
The arithmetic NORMALIZERS also accept jnp arrays (fused on-device); the
LABEL transforms are numpy-only — they use in-place boolean assignment,
which JAX's immutable arrays reject, and run on the (tiny) label rasters in
the host pipeline anyway.
"""

from __future__ import annotations

import numpy as np

from maskedsst_tpu.data import constants as C


# --- EnMAP ------------------------------------------------------------------

def standardize_enmap(x: np.ndarray, use_clipped: bool = True) -> np.ndarray:
    """Band-wise (x - mean) / std over the 200 valid bands
    (StandardizeEnMAP, src/data_enmap.py:454-457)."""
    means = C.ENMAP_MEANS_CLIPPED if use_clipped else C.ENMAP_MEANS
    stds = C.ENMAP_STDS_CLIPPED if use_clipped else C.ENMAP_STDS
    return (x - means[:, None, None]) / stds[:, None, None]


def unstandardize_enmap(x: np.ndarray, use_clipped: bool = True) -> np.ndarray:
    means = C.ENMAP_MEANS_CLIPPED if use_clipped else C.ENMAP_MEANS
    stds = C.ENMAP_STDS_CLIPPED if use_clipped else C.ENMAP_STDS
    return x * stds[:, None, None] + means[:, None, None]


def worldcover_label_transform(x: np.ndarray) -> np.ndarray:
    """ESA WorldCover codes {0,10..100} → train ids
    (WorldCoverLabelTransform, src/data_enmap.py:524-551).

    Reproduces the reference transform bit-exactly, including its quirk:
    ``x[x==90]=10`` followed by ``//10 - 1`` collapses codes 90 and 100 onto
    class 0 rather than the 8/10 its own label dict declares. Checkpoint/
    metric parity requires matching the code, not the intent."""
    x = x.astype(np.int64).copy()
    x[x == 100] = 11
    x[x == 90] = 10
    return x // 10 - 1


def dfc_label_transform(x: np.ndarray) -> np.ndarray:
    """DFC2020 codes 1..10 → train ids with classes 3 (Savanna) and
    8 (Snow/Ice) mapped to -1 and the rest compacted to 0..7
    (DFCLabelTransform, src/data_enmap.py:553-580)."""
    x = x.astype(np.int64).copy()
    x[x == 3] = 0
    x[x == 8] = 0
    x[x >= 3] -= 1
    x[x >= 8] -= 1
    return x - 1


def max_normalize_enmap(x: np.ndarray) -> np.ndarray:
    """Band-wise division by dataset maxima (MaxNormalizeEnMAP,
    src/data_enmap.py:464-504). Note the reference's table has 202 entries
    (two trailing values belong to removed bands); only the first ``bands``
    rows apply."""
    maxs = C.ENMAP_MAXS[: x.shape[0]]
    return x / maxs[:, None, None]


def max_normalize_all_bands_same(x: np.ndarray, maximum: float = 25000.0) -> np.ndarray:
    """Single global max (MaxNormalizeAllBandsSame, src/data_enmap.py:506-515)."""
    return x / maximum


# --- Houston2018 ------------------------------------------------------------

def standardize_houston2018(x: np.ndarray) -> np.ndarray:
    """Band-wise standardization of the 48 CASI bands
    (StandardizeHouston2018, src/data_houston2018.py:442-445)."""
    return (x - C.HOUSTON2018_MEANS[:, None, None]) / C.HOUSTON2018_STDS[:, None, None]


def houston2018_label_transform(x: np.ndarray) -> np.ndarray:
    """Class 0 (unclassified) → -1; classes shift to 0..19
    (Houston2018LabelTransform, src/data_houston2018.py:454-465)."""
    return x.astype(np.int64) - 1
