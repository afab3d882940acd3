"""Tile → sliding-window expansion shared by the trainers' validation paths.

The reference validates by sliding an ``image_size`` window at stride =
window over each 64x64 tile (pretrain.py:166-184, src/utils.py:503-517).
One implementation here replaces four hand-copied reshape/transpose blocks
(finetuner ``_prep``/``_eval_sums_idx``/``_window_batch``, pretrainer
``_step_val``) so geometry fixes propagate everywhere.

Works on jnp or np arrays (pure reshape/transpose). When the tiles are
already at window size (e.g. houston2018 8x8 patches — the reference skips
windowing for those datasets), the inputs pass through cropped to [.., s, s]
with no batch expansion.
"""

from __future__ import annotations

from typing import Tuple


def window_tiles(img, s: int, label=None) -> Tuple:
    """img [B, C, T, T] (+ label [B, T, T]) → windows [B*k*k, C, s, s]
    (+ [B*k*k, s, s]) with k = T // s; identity (cropped) when k <= 1."""
    b, c = img.shape[0], img.shape[1]
    if img.shape[2] < s or img.shape[3] < s:
        # fail at the geometry helper, not with a shape error deep inside
        # the jitted model
        raise ValueError(
            f"window size {s} exceeds tile {img.shape[2]}x{img.shape[3]}"
        )
    k = img.shape[2] // s
    if k <= 1:
        img = img[:, :, :s, :s]
        if label is not None:
            label = label[:, :s, :s] if getattr(label, "ndim", 0) == 3 else label
        return (img, label) if label is not None else (img,)
    img = img[:, :, : k * s, : k * s].reshape(b, c, k, s, k, s)
    img = img.transpose(0, 2, 4, 1, 3, 5).reshape(b * k * k, c, s, s)
    if label is not None:
        label = label[:, : k * s, : k * s].reshape(b, k, s, k, s)
        label = label.transpose(0, 1, 3, 2, 4).reshape(b * k * k, s, s)
        return img, label
    return (img,)
