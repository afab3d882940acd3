"""Classification metrics.

Parity targets:
* micro accuracy with ignored-label masking (src/utils.py:651-653),
* macro accuracy à la ``torchmetrics.Accuracy('multiclass', average='macro')``
  (finetune.py:144-146): per-class recall averaged over classes *present in
  the target* (classes with zero support are excluded from the mean),
* the DeepHyperX evaluation block: confusion matrix, overall accuracy,
  per-class F1 and Cohen's kappa (DeepHyperX/utils.py:331-385).

All are pure jnp functions usable inside jit; confusion-matrix assembly uses
one-hot matmuls rather than scatters (TPU-friendly).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def micro_accuracy(pred: jnp.ndarray, label: jnp.ndarray, ignored_label: int = -1) -> jnp.ndarray:
    """Fraction of correctly predicted non-ignored pixels. NaN-free: returns 0
    when nothing is valid."""
    valid = label != ignored_label
    correct = jnp.sum((pred == label) & valid)
    total = jnp.sum(valid)
    return jnp.where(total > 0, correct / jnp.maximum(total, 1), 0.0)


def confusion_matrix(
    pred: jnp.ndarray, label: jnp.ndarray, num_classes: int, ignored_label: int = -1
) -> jnp.ndarray:
    """[num_classes, num_classes] counts, rows = true class, cols = predicted.
    Ignored-label pixels contribute nothing."""
    pred = pred.reshape(-1)
    label = label.reshape(-1)
    valid = (label != ignored_label).astype(jnp.float32)
    t = jax_one_hot(label, num_classes) * valid[:, None]
    p = jax_one_hot(pred, num_classes)
    return t.T @ p


def jax_one_hot(x: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    # direct equality: out-of-range values (negative OR >= num_classes)
    # produce an all-zero row and drop out of every count — clipping would
    # silently fold ids >= num_classes into the last class
    return (x[..., None] == jnp.arange(num_classes)).astype(jnp.float32)


def macro_accuracy(
    pred: jnp.ndarray, label: jnp.ndarray, num_classes: int, ignored_label: int = -1
) -> jnp.ndarray:
    """Mean per-class recall over classes with support (torchmetrics
    multiclass macro accuracy semantics)."""
    cm = confusion_matrix(pred, label, num_classes, ignored_label)
    support = cm.sum(axis=1)
    recall = jnp.where(support > 0, jnp.diag(cm) / jnp.maximum(support, 1), 0.0)
    present = (support > 0).astype(jnp.float32)
    n_present = jnp.maximum(present.sum(), 1.0)
    return (recall * present).sum() / n_present


def classification_report(cm: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """DeepHyperX ``metrics`` block from a confusion matrix
    (DeepHyperX/utils.py:331-385): overall accuracy (percent), per-class F1,
    Cohen's kappa."""
    total = jnp.maximum(cm.sum(), 1.0)
    diag = jnp.diag(cm)
    accuracy = diag.sum() * 100.0 / total
    denom = cm.sum(axis=1) + cm.sum(axis=0)
    f1 = jnp.where(denom > 0, 2.0 * diag / jnp.maximum(denom, 1), 0.0)
    pa = diag.sum() / total
    pe = jnp.sum(cm.sum(axis=0) * cm.sum(axis=1)) / (total * total)
    kappa = (pa - pe) / jnp.maximum(1.0 - pe, 1e-12)
    return {"accuracy": accuracy, "f1": f1, "kappa": kappa, "confusion_matrix": cm}
