"""Train / validate / full-scene inference for the HyperX benchmark
(reference DeepHyperX/models.py:998-1230).

One jitted train step per model covering both supervision modes:
* full: weighted cross-entropy on (center-pixel) labels;
* semi: CE + ``aux_loss_weight`` × MSE reconstruction of the center spectrum
  (liu) or the input spectrum (boulch), reference criterion lambdas
  (models.py:153-169).

BatchNorm models carry a ``batch_stats`` collection threaded through the
step. ``test()`` reproduces the reference's sliding-window full-scene
inference (models.py:1157-1207): batched windows, class-probability
accumulation per pixel (center-pixel or dense), argmax at the end — with
fixed-size batches (padded) so XLA compiles one step.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from maskedsst_tpu.data.pipeline import DataLoader
from maskedsst_tpu.hyperx.utils import grouper, sliding_window
from maskedsst_tpu.train.losses import cross_entropy
from maskedsst_tpu.train.optim import (
    build_optimizer,
    MultiStepLR,
    ReduceLROnPlateau,
)
from maskedsst_tpu.utils.tracking import Tracker


class HyperXTrainer:
    def __init__(self, model, opt_spec: Dict, criterion_spec: Dict, hyperparams: Dict):
        self.model = model
        self.hp = hyperparams
        self.center_pixel = hyperparams["center_pixel"]
        self.patch_size = hyperparams["patch_size"]
        self.supervision = hyperparams.get("supervision", "full")
        self.weights = jnp.asarray(criterion_spec["weight"])
        self.aux_loss_weight = getattr(model, "aux_loss_weight", 1.0)

        spec = dict(opt_spec)
        tx = build_optimizer(
            spec.pop("name"), spec.pop("learning_rate"), spec.pop("weight_decay", 0.0), **spec
        )
        self.tx = tx

        n_bands = hyperparams["n_bands"]
        p = self.patch_size
        shape = (2, n_bands) if p == 1 else (2, 1, n_bands, p, p)
        variables = jax.jit(partial(model.init, deterministic=True))(
            jax.random.PRNGKey(0), jnp.zeros(shape, jnp.float32)
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = tx.init(self.params)
        self.rng = jax.random.PRNGKey(hyperparams.get("seed", 0))
        sched_spec = hyperparams.get("scheduler")
        if isinstance(sched_spec, dict) and sched_spec.get("type") == "MultiStepLR":
            # the sharma recipe (DeepHyperX/models.py:137-143)
            self.scheduler = MultiStepLR(sched_spec["milestones"], sched_spec.get("gamma", 0.1))
        else:
            self.scheduler = ReduceLROnPlateau(
                factor=0.1, patience=max(hyperparams.get("epoch", 100) // 4, 1)
            )
        self._train_step = jax.jit(self._step)
        self._predict = jax.jit(self._forward_eval)

    # --- jitted bodies ------------------------------------------------------
    def _apply(self, params, batch_stats, img, train: bool, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        kwargs: Dict[str, Any] = {"deterministic": not train}
        if train:
            out = self.model.apply(
                variables,
                img,
                rngs={"dropout": rng},
                mutable=["batch_stats"] if batch_stats else [],
                **kwargs,
            )
            if isinstance(out, tuple) and len(out) == 2 and isinstance(out[1], dict):
                out, updates = out
                return out, updates.get("batch_stats", batch_stats)
            return out, batch_stats
        return self.model.apply(variables, img, **kwargs), batch_stats

    def _loss(self, params, batch_stats, img, label, rng):
        out, new_stats = self._apply(params, batch_stats, img, True, rng)
        if self.supervision == "semi":
            logits, rec = out
            if self.patch_size > 1:
                # center-pixel spectrum target (reference models.py:153-157)
                target = img[:, 0, :, self.patch_size // 2, self.patch_size // 2]
            else:
                target = img.reshape(img.shape[0], -1)
            # exclude the zero-padded rows of a trailing batch (label -100),
            # which would otherwise pull the autoencoder toward the zero
            # spectrum (the reference just runs a short final batch). NOTE:
            # BatchNorm batch statistics still see the padded rows that step
            # — a small, bounded deviation from short-batch semantics.
            valid = (label != -100).astype(rec.dtype)
            per_row = jnp.mean((rec - target) ** 2, axis=-1)
            aux = jnp.sum(per_row * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        else:
            logits = out[0] if isinstance(out, tuple) else out
            aux = 0.0
        ce = cross_entropy(logits, label, ignore_index=-100, weight=self.weights)
        return ce + self.aux_loss_weight * aux, (logits, new_stats)

    def _step(self, params, batch_stats, opt_state, img, label, rng):
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(params, batch_stats, img, label, rng)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    def _forward_eval(self, params, batch_stats, img):
        out, _ = self._apply(params, batch_stats, img, False, None)
        logits = out[0] if isinstance(out, tuple) else out
        return logits

    # --- loops --------------------------------------------------------------
    def save(self, path: str) -> None:
        """Persist the model variables (flax msgpack; loaded back by
        :meth:`restore`). Counterpart of the reference's ``save_model``
        (DeepHyperX/models.py:1137-1154). BatchNorm running statistics are
        saved alongside the params — the reference's torch ``state_dict``
        includes running_mean/running_var, so a restore that dropped them
        would evaluate BN nets with init stats."""
        import os

        from flax import serialization

        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        payload = {"params": self.params}
        if self.batch_stats:
            payload["batch_stats"] = self.batch_stats
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))

    def restore(self, path: str) -> None:
        """Load params (+ batch_stats when present) saved by :meth:`save`;
        also accepts bare-params checkpoints (older files, finetune
        exports)."""
        from flax import serialization

        with open(path, "rb") as f:
            data = f.read()
        raw = serialization.msgpack_restore(data)
        if "params" in raw:
            self.params = serialization.from_state_dict(self.params, raw["params"])
            if self.batch_stats and "batch_stats" in raw:
                self.batch_stats = serialization.from_state_dict(
                    self.batch_stats, raw["batch_stats"]
                )
        else:  # bare params tree
            self.params = serialization.from_state_dict(self.params, raw)

    def train(
        self,
        dataset,
        epochs: Optional[int] = None,
        val_dataset=None,
        tracker: Optional[Tracker] = None,
        display_iter: int = 100,
        max_steps: Optional[int] = None,
        save_dir: Optional[str] = None,
    ) -> Dict:
        hp = self.hp
        epochs = epochs if epochs is not None else hp.get("epoch", 100)
        tracker = tracker or Tracker("hyperx", quiet=False)
        loader = DataLoader(
            dataset,
            hp.get("batch_size", 100),
            shuffle=True,
            seed=hp.get("seed", 0),
            pad_to_multiple=hp.get("batch_size", 100),
            pad_label_value=-100,
        )
        step = 0
        history = {"loss": [], "val_acc": []}
        best_metric = float("inf")
        for epoch in range(1, epochs + 1):
            avg_loss, n_batches = 0.0, 0
            for batch in loader:
                self.rng, sub = jax.random.split(self.rng)
                self.params, self.batch_stats, self.opt_state, loss = self._train_step(
                    self.params,
                    self.batch_stats,
                    self.opt_state,
                    jnp.asarray(batch["img"]),
                    jnp.asarray(batch["label"]),
                    sub,
                )
                step += 1
                n_batches += 1
                avg_loss += float(loss)
                if display_iter and step % display_iter == 0:
                    tracker.log({"epoch": epoch, "loss": float(loss)}, step=step)
                if max_steps is not None and step >= max_steps:
                    break
            avg_loss /= max(n_batches, 1)
            history["loss"].append(avg_loss)

            if val_dataset is not None:
                acc = self.val(val_dataset)
                history["val_acc"].append(acc)
                tracker.log({"epoch": epoch, "val_acc": acc}, step=step)
                metric = -acc
            else:
                metric = avg_loss
            # DELIBERATE DEVIATION: the reference saves unconditionally every
            # save_epoch epochs (DeepHyperX/models.py:1126-1135); saving the
            # BEST-metric state instead is strictly more useful and is what
            # --restore / inference consume
            if save_dir is not None and metric < best_metric:
                best_metric = metric
                import os

                self.save(os.path.join(save_dir, "best.msgpack"))
            self.opt_state = self.scheduler.update(self.opt_state, metric)
            if max_steps is not None and step >= max_steps:
                break
        return history

    def val(self, dataset) -> float:
        """Accuracy over a patch dataset, ignoring ignored-label targets.
        (The reference's val() skips *predictions* equal to an ignored label,
        models.py:1224-1227 — a metric quirk deliberately not replicated.)"""
        loader = DataLoader(
            dataset,
            self.hp.get("batch_size", 100),
            shuffle=False,
            pad_to_multiple=self.hp.get("batch_size", 100),
            pad_label_value=-100,
        )
        correct, total = 0, 0
        ignored = set(self.hp.get("ignored_labels", []))
        for batch in loader:
            logits = self._predict(
                self.params, self.batch_stats, jnp.asarray(batch["img"])
            )
            pred = np.asarray(jnp.argmax(logits, axis=1))
            label = np.asarray(batch["label"])
            keep = label != -100
            for l in ignored:
                keep &= label != l
            correct += int((pred[keep] == label[keep]).sum())
            total += int(keep.sum())
        return correct / total if total else 0.0

    def test(self, img: np.ndarray, batch_size: Optional[int] = None) -> np.ndarray:
        """Class-probability map [H, W, n_classes] by sliding a patch window
        over the scene (reference test(), models.py:1157-1207)."""
        hp = self.hp
        patch_size = self.patch_size
        batch_size = batch_size or hp.get("batch_size", 100)
        n_classes = hp["n_classes"]
        step_stride = hp.get("test_stride", 1)
        probs = np.zeros(img.shape[:2] + (n_classes,))

        windows = sliding_window(
            img, step=step_stride, window_size=(patch_size, patch_size)
        )
        for batch in grouper(batch_size, windows):
            if patch_size == 1:
                data = np.array([b[0][0, 0] for b in batch], dtype=np.float32)
            else:
                data = np.array([b[0] for b in batch], dtype=np.float32)
                data = data.transpose(0, 3, 1, 2)[:, None]  # [B, 1, C, p, p]
            n_real = data.shape[0]
            if n_real < batch_size:  # keep one compiled shape
                pad = batch_size - n_real
                data = np.concatenate([data, np.zeros((pad, *data.shape[1:]), data.dtype)])
            logits = self._predict(self.params, self.batch_stats, jnp.asarray(data))
            out = np.asarray(logits)[:n_real]
            indices = [b[1:] for b in batch]
            if patch_size != 1 and not self.center_pixel:
                out = out.transpose(0, 2, 3, 1)  # [B, p, p, n_classes]
            for (x, y, w, h), o in zip(indices, out):
                if self.center_pixel:
                    probs[x + w // 2, y + h // 2] += o
                else:
                    probs[x : x + w, y : y + h] += o
        return probs
