"""Fixed sin-cos positional embeddings (MAE-style).

Numerically identical to the reference tables (src/pos_embed.py:16-63), which
this model family bakes into its checkpoints: the 1D table is
``[sin(pos ⊗ ω), cos(pos ⊗ ω)]`` with ``ω_k = 10000^{-k/(D/2)}``, and the 2D
table concatenates the 1D embeddings of the column and row grids (column
coordinate first — a quirk of the reference's ``meshgrid(grid_w, grid_h)``
order). Computed in numpy at init time (these are
constants, not traced values) and handed to the model as initializer output.
"""

from __future__ import annotations

import numpy as np


def get_1d_sincos_pos_embed(embed_dim: int, pos) -> np.ndarray:
    """1D sin-cos table for arbitrary (possibly non-integer) positions.

    Args:
      embed_dim: output dimension D (must be even).
      pos: array of M positions.

    Returns:
      float32 array [M, D] = concat(sin, cos) halves.
    """
    assert embed_dim % 2 == 0, f"{embed_dim=} must be even"
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    pos = np.asarray(pos, dtype=np.float64).reshape(-1)
    angles = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(angles), np.cos(angles)], axis=1).astype(np.float32)


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: int, cls_token: bool = False
) -> np.ndarray:
    """2D sin-cos table for a square grid.

    Token order is row-major over (h, w); the first D/2 dims encode the
    column coordinate, the last D/2 the row, matching the reference's
    ``meshgrid(grid_w, grid_h)`` + concat order (src/pos_embed.py:22-41).

    Returns:
      float32 array [grid_size**2, D] (prepended with a zero row if
      ``cls_token``).
    """
    assert embed_dim % 2 == 0
    coords = np.arange(grid_size, dtype=np.float64)
    col_grid, row_grid = np.meshgrid(coords, coords)  # [H, W]: col[i,j]=j, row[i,j]=i
    emb_first = get_1d_sincos_pos_embed(embed_dim // 2, col_grid.reshape(-1))
    emb_second = get_1d_sincos_pos_embed(embed_dim // 2, row_grid.reshape(-1))
    pos_embed = np.concatenate([emb_first, emb_second], axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim], np.float32), pos_embed], 0)
    return pos_embed


def interpolate_pos_embed(pos_embed: np.ndarray, new_grid_size: int, num_extra_tokens: int = 0) -> np.ndarray:
    """Resize a learned positional table to a new square grid resolution.

    Functional equivalent of the reference's checkpoint surgery
    (src/pos_embed.py:92-125, the DeiT recipe): the leading
    ``num_extra_tokens`` rows (cls/dist tokens) pass through unchanged and
    the remaining rows are treated as a [S, S, D] grid and resampled
    bicubically to [S', S', D]. The reference mutates a torch state dict
    in-place; here it is a pure array → array function used by the
    checkpoint importer. (torch's bicubic uses the a=-0.75 kernel,
    jax.image's cubic the Keys a=-0.5 kernel — resampled tables differ in
    the 3rd decimal; both are resolution-transfer heuristics, not
    checkpoint-parity paths.)

    Args:
      pos_embed: [1, T, D] or [T, D] table with T = extra + S*S rows.
      new_grid_size: target grid side S'.
      num_extra_tokens: leading rows kept unchanged.

    Returns:
      float32 array of the input rank with extra + S'*S' rows.
    """
    import jax

    table = np.asarray(pos_embed, np.float32)
    squeeze = table.ndim == 2
    if squeeze:
        table = table[None]
    extra, grid = table[:, :num_extra_tokens], table[:, num_extra_tokens:]
    d = table.shape[-1]
    orig_size = int(round(grid.shape[1] ** 0.5))
    assert orig_size * orig_size == grid.shape[1], (
        f"pos table rows {grid.shape[1]} are not a square grid"
    )
    if orig_size != new_grid_size:
        grid = grid.reshape(1, orig_size, orig_size, d)
        grid = np.asarray(
            jax.image.resize(grid, (1, new_grid_size, new_grid_size, d), method="cubic")
        )
        grid = grid.reshape(1, new_grid_size * new_grid_size, d)
    out = np.concatenate([extra, grid], axis=1)
    return out[0] if squeeze else out
