"""Classification losses.

``cross_entropy`` reproduces torch ``nn.CrossEntropyLoss``:
* ``ignore_index`` semantics — ignored targets contribute neither to the sum
  nor the normalizer (finetune.py:136);
* optional per-class ``weight`` vector with weighted-mean normalization —
  the DeepHyperX recipes build weights with the ignored class zeroed
  (DeepHyperX/models.py:36-39; note the reference indexes ``weights[-1]=0``
  for ignored label -1, which zeroes the *last real class* — a quirk callers
  can reproduce by passing such a weight vector explicitly).

Logits may be [B, C] or dense [B, C, H, W]; targets [B] / [B, H, W].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int = -1,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    # defined as the ratio of cross_entropy_sums so the chunk-aggregation
    # invariant (sum(nums)/sum(wsums) over chunks == cross_entropy over
    # their union) holds by construction
    num, wsum = cross_entropy_sums(
        logits, targets, ignore_index=ignore_index, weight=weight
    )
    return num / jnp.maximum(wsum, 1e-12)


def cross_entropy_sums(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int = -1,
    weight: Optional[jnp.ndarray] = None,
):
    """(weighted-NLL numerator, weight mass) for exact cross-chunk loss
    aggregation: ``sum(nums) / sum(wsums)`` over chunks equals
    :func:`cross_entropy` over their union — which ``mean_i * n_valid_i``
    bookkeeping does NOT when per-class weights are set (each chunk's
    weighted mean would be re-weighted by its count instead of its mass)."""
    if logits.ndim == 4:  # [B, C, H, W] → [N, C]
        num_classes = logits.shape[1]
        logits = jnp.moveaxis(logits, 1, -1).reshape(-1, num_classes)
        targets = targets.reshape(-1)
    num_classes = logits.shape[-1]
    valid = targets != ignore_index
    safe_targets = jnp.clip(targets, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    if weight is not None:
        w = weight[safe_targets] * valid
    else:
        w = valid.astype(jnp.float32)
    return (nll * w).sum(), w.sum()
