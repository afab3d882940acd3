"""Supervised finetuning / linear-eval loop (reference finetune.py:40-222,
src/utils.py:477-663).

One jitted ``train_step(state, img, label) -> (state, metrics)`` with the
same on-device structure as pretraining: optional random crop (or
shifting-window tiling) of 64x64 tiles, center-pixel label extraction for
pixelwise/li models, cross-entropy with ignored labels, micro+macro accuracy,
Adam update with split head/backbone LRs — batch sharded over the mesh's
``data`` axis.

Validation reproduces the reference's sliding-window evaluation over 64x64
tiles but vectorizes all windows into one forward and averages over *all*
windows. (The reference's metric bookkeeping only records the last window of
each batch — the append sits outside the window loops, src/utils.py:569-571;
that accounting quirk is deliberately not replicated.)
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from maskedsst_tpu.config import Config
from maskedsst_tpu.data.pipeline import DataLoader
from maskedsst_tpu.ops.fused_layer import largest_divisor
from maskedsst_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    global_streamed_batch,
    put_replicated,
    replicate,
)
from maskedsst_tpu.train.checkpoint import save_checkpoint
from maskedsst_tpu.train.losses import cross_entropy
from maskedsst_tpu.train.metrics import macro_accuracy, micro_accuracy
from maskedsst_tpu.train.optim import (
    ReduceLROnPlateau,
    build_optimizer,
    get_learning_rates,
)
from maskedsst_tpu.train.train_state import TrainState
from maskedsst_tpu.train.windows import window_tiles
from maskedsst_tpu.utils.tracking import Throughput, Tracker


def get_val_epochs(config: Config, steps_per_epoch: int) -> list:
    """Validation epochs (reference get_val_epochs, src/utils.py:432-448):
    when the epoch budget dominates, validate every epoch; when max_steps
    dominates, spread ``epoch`` validations evenly over the longer run."""
    total_steps = steps_per_epoch * config.epoch
    if total_steps > config.max_steps:
        return list(range(config.epoch))
    total_epochs = config.max_steps // max(steps_per_epoch, 1)
    return sorted(set(int(e) for e in np.linspace(0, total_epochs, config.epoch)))


def make_head_label_fn(method_name=None):
    """Path predicate marking classifier-head params, mirroring the
    reference's name split (finetune.py:103): ``classifier_name = 'fc'``
    ONLY for the li 3D-CNN (its classifier layers are fc1/fc2),
    ``mlp_head`` for the ViTs. A blanket 'fc' prefix would also catch the
    ViT transformer's feed-forward fc1/fc2 layers — linear_eval would then
    silently train most of the backbone, and split LRs would train every
    FF layer at the head LR."""
    if method_name == "li":
        return lambda path: any(str(k).startswith("fc") for k in path)
    return lambda path: any(str(k).startswith(("head_", "mlp_head")) for k in path)


def head_label_fn(path: tuple) -> bool:
    """Default (ViT) head predicate; kept for callers that don't thread a
    method name. See :func:`make_head_label_fn`."""
    return make_head_label_fn(None)(path)


class Finetuner:
    def __init__(
        self,
        config: Config,
        model,
        mesh=None,
        params=None,
        center_pixel: bool = False,
        add_channel_dim: bool = False,
        optimizer_override: Optional[dict] = None,
        class_weights: Optional[np.ndarray] = None,
        tile_size: int = 64,
    ):
        self.config = config
        self.model = model
        self.mesh = mesh if mesh is not None else get_mesh()
        self.center_pixel = center_pixel
        self.add_channel_dim = add_channel_dim
        self.tile_size = tile_size
        self.class_weights = None if class_weights is None else jnp.asarray(class_weights)

        opt = dict(
            name="Adam",
            learning_rate=config.lr,
            weight_decay=config.weight_decay,
            head_lr=config.get("mlp_head_lr"),
            head_label_fn=make_head_label_fn(config.get("method_name")),
            linear_eval=bool(config.get("linear_eval", False)),
        )
        if optimizer_override:
            opt.update(optimizer_override)
        if opt["linear_eval"]:
            opt["head_lr"] = None  # linear eval trains the head at the base lr
        tx = build_optimizer(
            opt.pop("name"), opt.pop("learning_rate"), opt.pop("weight_decay"), **opt
        )

        rng = jax.random.PRNGKey(config.get("seed", 5))
        if params is None:
            size = config.image_size - config.get("patch_sub", 0)
            # init at the data-axis batch so the fused embed kernel's
            # shard_map guard never warns/falls back during tracing
            ib = 1 if self.mesh is None else self.mesh.shape.get("data", 1)
            shape = (
                (ib, 1, config.n_bands, size, size)
                if add_channel_dim
                else (ib, config.n_bands, size, size)
            )
            init_fn = jax.jit(partial(model.init, deterministic=True))
            params = init_fn(rng, jnp.zeros(shape, jnp.float32))["params"]
        self.state = TrainState.create(params, tx, jax.random.fold_in(rng, 1))
        self.state = jax.device_put(self.state, replicate(self.mesh))
        self.num_params = sum(p.size for p in jax.tree.leaves(params))
        self.scheduler = ReduceLROnPlateau(factor=0.9, patience=5)
        # loop state restored by resume() and consumed by fit()
        self._resume_extra: dict = {}

        self._replicated = replicate(self.mesh)
        self._batch_shard = batch_sharding(self.mesh)
        crop = config.image_size != tile_size and config.dataset in ("dfc", "worldcover")
        self._train_step = jax.jit(
            partial(
                self._step,
                crop=crop,
                shifting_window=bool(config.get("shifting_window", False)),
            ),
            in_shardings=(self._replicated, self._batch_shard, self._batch_shard),
            out_shardings=(self._replicated, self._replicated),
            donate_argnums=(0,),
        )
        self._eval_windows = crop
        # eval runs on fixed-size chunks of (possibly windowed) samples so the
        # sliding-window expansion (x(tile/s)^2 samples) never OOMs HBM
        self.eval_chunk = int(config.get("eval_chunk", 256))
        self._eval_step = jax.jit(
            self._eval_sums,
            in_shardings=(self._replicated, self._batch_shard, self._batch_shard),
            out_shardings=self._replicated,
        )
        # HBM-resident variants: samples stay on device, only indices move
        self._train_step_idx = jax.jit(
            partial(
                self._step_idx,
                crop=crop,
                shifting_window=bool(config.get("shifting_window", False)),
            ),
            in_shardings=(self._replicated,) * 4,
            out_shardings=(self._replicated, self._replicated),
            donate_argnums=(0,),
        )
        self._eval_step_idx = jax.jit(
            self._eval_sums_idx,
            in_shardings=(self._replicated,) * 4,
            out_shardings=self._replicated,
        )
        # superstep: scan steps_per_call train steps in ONE dispatch (same
        # trick as the Pretrainer) — amortizes the fixed host↔device round
        # trip across K steps when samples are HBM-resident
        self.steps_per_call = int(config.get("steps_per_call", 8))
        self._train_superstep = jax.jit(
            partial(
                self._superstep,
                crop=crop,
                shifting_window=bool(config.get("shifting_window", False)),
            ),
            in_shardings=(self._replicated,) * 4,
            out_shardings=(self._replicated, self._replicated),
            donate_argnums=(0,),
        )

    # --- jitted bodies ------------------------------------------------------
    def _forward_loss(self, params, img, label, dropout_rng, train: bool):
        if self.add_channel_dim:
            img = img[:, None]  # li 3D-CNN input layout (utils.py:637-638)
        rngs = {"dropout": dropout_rng} if train else {}
        logits = self.model.apply(
            {"params": params}, img, deterministic=not train, rngs=rngs
        )
        loss = cross_entropy(
            logits, label, ignore_index=self.config.ignored_label, weight=self.class_weights
        )
        return loss, logits

    def _crop_draw(self, rng):
        """One random crop origin per batch. Single source of truth for the
        crop arithmetic shared by _prep (direct batches) and _step_idx (the
        fused gather+crop HBM-store path) — the two must stay bit-identical
        (pinned by test_finetuner_step_idx_matches_step).

        The origin range deliberately reproduces the reference's
        ``randint(0, 64 - image_size - patch_sub)`` (utils.py:614-617),
        which under patch_sub is NARROWER than the full valid range
        ``tile_size - s``: the last 2*patch_sub origins are never drawn.
        Kept for trajectory parity — do not "fix" to tile_size - s."""
        s = self.config.image_size - self.config.get("patch_sub", 0)
        hi = max(
            self.tile_size - self.config.image_size - self.config.get("patch_sub", 0),
            1,
        )
        return s, jax.random.randint(rng, (2,), 0, hi)

    def _prep(self, img, label, rng, *, crop: bool, shifting_window: bool):
        s = self.config.image_size - self.config.get("patch_sub", 0)
        if crop and shifting_window:
            # tile into non-overlapping s×s patches stacked on batch
            # (stack_image_batch, src/utils.py:451-474)
            img, label = window_tiles(img, s, label)
        elif crop:
            s, xy = self._crop_draw(rng)
            img = jax.lax.dynamic_slice(
                img, (0, 0, xy[0], xy[1]), (img.shape[0], img.shape[1], s, s)
            )
            label = jax.lax.dynamic_slice(
                label, (0, xy[0], xy[1]), (label.shape[0], s, s)
            )
        if self.center_pixel and label.ndim == 3:
            center = s // 2
            label = label[:, center, center]  # utils.py:630-634
        return img, label

    def _pad_batch(self, img, label):
        """Pad the (possibly windowed) batch to a multiple of the data-axis
        size: the fused Pallas kernels shard_map over the data axis only
        when the batch divides it (parallel.mesh.data_axis_or_warn falls
        back to GSPMD otherwise, which may all-gather the batch onto every
        chip). Pad rows carry ``ignored_label``, so the weighted loss (zero
        weight mass) and every metric (validity mask) drop them exactly —
        loss, gradients, and metrics are bit-unchanged."""
        n_data = 1 if self.mesh is None else self.mesh.shape.get("data", 1)
        pad = (-img.shape[0]) % n_data
        if pad == 0:
            return img, label
        img = jnp.concatenate(
            [img, jnp.zeros((pad, *img.shape[1:]), img.dtype)], axis=0
        )
        label = jnp.concatenate(
            [
                label,
                jnp.full(
                    (pad, *label.shape[1:]), self.config.ignored_label, label.dtype
                ),
            ],
            axis=0,
        )
        return img, label

    def _step(self, state: TrainState, img, label, *, crop: bool, shifting_window: bool):
        rng, crop_rng, drop_rng = jax.random.split(state.rng, 3)
        img, label = self._prep(img, label, crop_rng, crop=crop, shifting_window=shifting_window)
        img, label = self._pad_batch(img, label)
        return self._apply_update(state, img, label, rng, drop_rng)

    def _apply_update(self, state: TrainState, img, label, rng, drop_rng):
        (loss, logits), grads = jax.value_and_grad(self._forward_loss, has_aux=True)(
            state.params, img, label, drop_rng, True
        )
        state = state.apply_gradients(grads).replace(rng=rng)
        pred = jnp.argmax(logits, axis=1)
        metrics = {
            "loss": loss,
            "acc": micro_accuracy(pred, label, self.config.ignored_label),
            "macro_acc": macro_accuracy(
                pred, label, self.config.n_classes, self.config.ignored_label
            ),
        }
        return state, metrics

    def _eval_sums(self, state: TrainState, img, label):
        """Per-chunk metric SUMS (weighted-loss numerator + weight mass,
        correct, valid, confusion matrix); host aggregation over
        chunks/batches then yields exact global metrics, including under
        per-class loss weights (li recipe)."""
        from maskedsst_tpu.train.losses import cross_entropy_sums
        from maskedsst_tpu.train.metrics import confusion_matrix

        s = self.config.image_size - self.config.get("patch_sub", 0)
        if self.center_pixel and label.ndim == 3:
            center = s // 2
            label = label[:, center, center]
        img, label = self._pad_batch(img, label)
        _, logits = self._forward_loss(state.params, img, label, state.rng, False)
        loss_num, loss_wsum = cross_entropy_sums(
            logits, label, ignore_index=self.config.ignored_label, weight=self.class_weights
        )
        pred = jnp.argmax(logits, axis=1)
        valid = (label != self.config.ignored_label)
        n_valid = jnp.sum(valid)
        return {
            "loss_num": loss_num,
            "loss_wsum": loss_wsum,
            "correct": jnp.sum((pred == label) & valid),
            "n_valid": n_valid,
            "cm": confusion_matrix(
                pred, label, self.config.n_classes, self.config.ignored_label
            ),
        }

    def _gather_batch(self, imgs, labels, idx):
        safe = jnp.maximum(idx, 0)
        img = jnp.take(imgs, safe, axis=0)
        img = jax.lax.with_sharding_constraint(img, self._batch_shard)
        label = jnp.take(labels, safe, axis=0)
        pad_shape = (idx >= 0).reshape((-1,) + (1,) * (label.ndim - 1))
        label = jnp.where(pad_shape, label, self.config.ignored_label)
        label = jax.lax.with_sharding_constraint(label, self._batch_shard)
        return img, label

    def _gather_crop_batch(self, imgs, labels, idx, xy, s: int):
        """Fused gather + crop from the HBM store: reads only the
        [B, C, s, s] crop windows (and the [B, s, s] label windows) instead
        of whole tiles — the Pretrainer._gather_crop trick (full 64x64
        tiles move ~64x the bytes; measured ~7 ms/step of gather+copy at
        the EnMAP finetune recipe, bs 64)."""
        c = imgs.shape[1]
        safe = jnp.maximum(idx, 0)

        def one_img(i):
            return jax.lax.dynamic_slice(imgs, (i, 0, xy[0], xy[1]), (1, c, s, s))[0]

        img = jax.vmap(one_img)(safe)
        img = jax.lax.with_sharding_constraint(img, self._batch_shard)

        def one_lab(i):
            return jax.lax.dynamic_slice(labels, (i, xy[0], xy[1]), (1, s, s))[0]

        label = jax.vmap(one_lab)(safe)
        pad_shape = (idx >= 0).reshape((-1,) + (1,) * (label.ndim - 1))
        label = jnp.where(pad_shape, label, self.config.ignored_label)
        label = jax.lax.with_sharding_constraint(label, self._batch_shard)
        return img, label

    def _step_idx(self, state, imgs, labels, idx, *, crop: bool, shifting_window: bool):
        if crop and not shifting_window and labels.ndim == 3:
            # replicate _step's key/draw order and _prep's crop arithmetic
            # exactly, so this path reproduces the direct-batch trajectory
            # bit-for-bit (pinned by test_finetuner_step_idx_matches_step)
            rng, crop_rng, drop_rng = jax.random.split(state.rng, 3)
            s, xy = self._crop_draw(crop_rng)
            img, label = self._gather_crop_batch(imgs, labels, idx, xy, s)
            if self.center_pixel and label.ndim == 3:
                center = s // 2
                label = label[:, center, center]
            img, label = self._pad_batch(img, label)
            return self._apply_update(state, img, label, rng, drop_rng)
        img, label = self._gather_batch(imgs, labels, idx)
        return self._step(state, img, label, crop=crop, shifting_window=shifting_window)

    def _superstep(self, state, imgs, labels, idx_chunk, *, crop: bool, shifting_window: bool):
        """idx_chunk [K, B] → K sequential train steps in one dispatch;
        returns per-step stacked metrics."""

        def body(state, idx):
            state, metrics = self._step_idx(
                state, imgs, labels, idx, crop=crop, shifting_window=shifting_window
            )
            return state, metrics

        return jax.lax.scan(body, state, idx_chunk)

    def _eval_sums_idx(self, state, imgs, labels, idx):
        """Windowed eval over HBM-resident tiles: gather ≤val_bs tiles by
        index, expand to sliding windows on device, reduce metric sums over
        bounded lax.map chunks."""
        img, label = self._gather_batch(imgs, labels, idx)
        s = self.config.image_size - self.config.get("patch_sub", 0)
        if self._eval_windows:
            img, label = window_tiles(img, s, label)
        n = img.shape[0]
        # fewest lax.map iterations for any window count, power of two or
        # not (same helper as Pretrainer._step_val, which uses its own
        # cap of 512 — the SimMIM val step carries no CE/confusion-matrix
        # working set, so it affords a larger chunk)
        chunk = largest_divisor(n, 256)
        img = img.reshape(n // chunk, chunk, *img.shape[1:])
        label = label.reshape(n // chunk, chunk, *label.shape[1:])
        sums = jax.lax.map(
            lambda args: self._eval_sums(state, args[0], args[1]), (img, label)
        )
        return jax.tree.map(lambda x: x.sum(axis=0), sums)

    def _global_batch(self, img, label):
        """Host-streamed (img, label) → global arrays sharded on the data
        axis (parallel.mesh.global_streamed_batch): each process slices its
        rows of the identically constructed, same-seed batch. Required under
        multi-process — a locally committed jnp.asarray is not a valid input
        to the global jitted step."""
        g = global_streamed_batch(
            self.mesh, {"img": np.asarray(img), "label": np.asarray(label)}
        )
        return g["img"], g["label"]

    def _window_batch(self, img: np.ndarray, label: np.ndarray):
        """Host-side sliding windows at stride s over 64x64 tiles
        (utils.py:503-517), then fixed-size chunks for the jitted eval."""
        s = self.config.image_size - self.config.get("patch_sub", 0)
        if self._eval_windows:
            img, label = window_tiles(img, s, label)
        chunk = self.eval_chunk
        n = img.shape[0]
        for lo in range(0, n, chunk):
            ci = img[lo : lo + chunk]
            cl = label[lo : lo + chunk]
            if ci.shape[0] < chunk:  # pad to the static chunk shape
                pad = chunk - ci.shape[0]
                ci = np.concatenate([ci, np.zeros((pad, *ci.shape[1:]), ci.dtype)])
                fill = np.full((pad, *cl.shape[1:]), self.config.ignored_label, cl.dtype)
                cl = np.concatenate([cl, fill])
            yield ci, cl

    def resume(self, path: str) -> int:
        """Restore the FULL finetune state from a checkpoint this trainer
        wrote: TrainState (params, optimizer moments, step, RNG) from the
        msgpack payload, plus the loop state the JSON sidecar carries —
        plateau-scheduler counters, ``best_val_acc``, and the last mean
        validation loss the end-of-epoch scheduler consumes. The reference
        cannot do this (its finetune checkpoints hold weights only,
        src/utils.py:584-604 — an interrupted 100-epoch run restarts from
        scratch). ``fit()`` afterwards continues at the restored step: it
        fast-forwards the loader's shuffle epoch and skips the
        already-trained batches of a partial epoch, and the truncated
        epoch's end hooks (validation, scheduler) run only in the run that
        completes it — so control-vs-resumed trajectories are bit-identical
        (pinned by test_train.py::test_finetuner_exact_resume). Returns the
        restored step."""
        from maskedsst_tpu.train.checkpoint import load_metadata, restore_checkpoint

        self.state = restore_checkpoint(path, self.state)
        self.state = jax.device_put(self.state, self._replicated)
        try:
            extra = load_metadata(path).get("extra", {})
        except FileNotFoundError:
            extra = {}
        sched = extra.get("scheduler")
        if sched and self.scheduler is not None:
            self.scheduler.load_state_dict(sched)
        self._resume_extra = dict(extra)
        return int(self.state.step)

    # --- loop ---------------------------------------------------------------
    def fit(
        self,
        train_dataset,
        val_dataset,
        tracker: Optional[Tracker] = None,
        models_dir: str = "models",
        save_checkpoints: bool = True,
        epochs: Optional[int] = None,
        max_steps: Optional[int] = None,
    ) -> dict:
        cfg = self.config
        tracker = tracker or Tracker("downstream", cfg, use_wandb=None)
        cfg.run_id = tracker.run_id
        cfg.num_params = self.num_params
        tracker.update_config(cfg)
        run_dir = os.path.join(models_dir, str(cfg.run_id))
        # persistence contract: only process 0 touches the filesystem
        # (save_checkpoint re-gates internally and makedirs its own parent;
        # an unguarded makedirs here would litter every non-primary rank's
        # divergent `local-*`/`nonprimary-*` run_id as an empty directory
        # on a shared filesystem)
        if save_checkpoints and jax.process_index() == 0:
            os.makedirs(run_dir, exist_ok=True)

        n_data = self.mesh.shape.get("data", 1)
        assert cfg.batch_size % n_data == 0 or cfg.batch_size < n_data, (
            f"{cfg.batch_size=} not divisible by data-parallel degree {n_data}"
        )
        val_bs = cfg.get("val_batch_size", cfg.batch_size)

        # prefer HBM-resident samples (index-only host→device traffic)
        train_store = val_store = None
        # datasets that draw fresh random samples per __getitem__ (e.g.
        # houston2018 random-patch mode) must stream: a one-time device-store
        # materialization would freeze a single draw for the whole run
        if cfg.get("device_data", True) and not getattr(
            train_dataset, "stochastic", False
        ):
            try:
                from maskedsst_tpu.data.device_store import DeviceTileStore, IndexBatcher

                train_store = DeviceTileStore(train_dataset, self.mesh)
                val_store = DeviceTileStore(val_dataset, self.mesh)
            except MemoryError as exc:
                print(f"[finetune] streaming from host: {exc}")
                train_store = val_store = None

        if train_store is not None:
            loader = IndexBatcher(
                len(train_store), cfg.batch_size, shuffle=True, seed=cfg.get("seed", 5)
            )
            val_loader = IndexBatcher(len(val_store), val_bs, shuffle=False)
        else:
            # pad the trailing batch to the FULL batch size: a single static
            # shape per step avoids XLA recompiles (padded samples carry
            # ignored labels, so losses/metrics exclude them)
            loader = DataLoader(
                train_dataset,
                cfg.batch_size,
                shuffle=True,
                drop_last=False,
                seed=cfg.get("seed", 5),
                pad_to_multiple=max(cfg.batch_size, n_data),
                pad_label_value=cfg.ignored_label,
            )
            val_loader = DataLoader(
                val_dataset,
                val_bs,
                shuffle=False,
                drop_last=False,
                pad_to_multiple=max(val_bs, n_data),
                pad_label_value=cfg.ignored_label,
            )

        # config budgets follow the reference "run until BOTH are exhausted"
        # loop (finetune.py:170); explicit overrides stop at whichever budget
        # is hit first (fast smoke runs)
        strict = epochs is not None or max_steps is not None
        epoch_budget = epochs if epochs is not None else cfg.epoch
        step_budget = max_steps if max_steps is not None else cfg.max_steps
        validation_epochs = set(get_val_epochs(cfg, max(len(loader), 1)))

        meter = Throughput(cfg.batch_size, num_chips=self.mesh.devices.size)
        meter.start()
        best_val_acc = float(self._resume_extra.get("best_val_acc") or 0.0)
        # most recent mean val loss (scheduler input); after resume the
        # stale loss keeps driving the every-epoch plateau step, exactly as
        # it would have in the uninterrupted run
        last_val_loss = self._resume_extra.get("last_val_loss")
        # one-shot: a later fit() on this trainer must not re-seed loop
        # state from a sidecar that an earlier fit() already consumed
        self._resume_extra = {}
        history = {"train": [], "val": [], "best_val_acc": best_val_acc}
        # continue counters after resume(): the step axis keeps its origin
        # and the loader fast-forwards so the resumed run consumes exactly
        # the batches the checkpointed run never saw (mirrors
        # Pretrainer.fit's resume plumbing)
        step = int(self.state.step)
        steps_per_epoch = max(1, len(loader))
        start_epoch = step // steps_per_epoch
        resume_skip = step - start_epoch * steps_per_epoch
        if start_epoch and hasattr(loader, "epoch"):
            loader.epoch = start_epoch
        if resume_skip and isinstance(loader, DataLoader):
            # index-level skip: already-trained batches of the partial epoch
            # are never read or prefetched
            loader.skip_next = resume_skip
        epoch = start_epoch

        def done() -> bool:
            if strict:
                return epoch >= epoch_budget or step >= step_budget
            return epoch >= epoch_budget + 1 and step >= step_budget + 1

        # reference logs the MEAN over the last logging_freq steps for
        # loss/acc/macro_acc (finetune.py:190-202); device scalars buffer
        # un-fetched and convert in one stack per logging boundary
        from collections import deque

        win = {k: deque(maxlen=cfg.logging_freq) for k in ("loss", "acc", "macro_acc")}

        def push_window(m, j=None):
            for k in win:
                if k in m:
                    win[k].append(m[k] if j is None else m[k][j])

        def window_means() -> dict:
            out = {}
            for k, v in win.items():
                if len(v):
                    out[k] = float(np.mean(np.asarray(jnp.stack([jnp.asarray(x) for x in v]))))
            return out

        def log_step(m: dict, rates: Optional[dict] = None):
            # the reference constructs-but-never-raises this ValueError
            # (src/utils.py:648-649) — a latent bug deliberately fixed here
            if "loss" in m and not np.isfinite(m["loss"]):
                raise ValueError("Loss is NaN")
            tracker.log(
                {
                    "epoch": epoch,
                    **m,
                    "lr": (get_learning_rates(self.state.opt_state) or [cfg.lr])[0],
                    # window_stats() RESETS the window — when one superstep
                    # chunk crosses several boundaries the caller reads it
                    # once and passes the shared chunk-average rates
                    **(rates if rates is not None else meter.window_stats()),
                },
                step=step,
            )

        while not done():
            metrics = None
            # how many batches a COMPLETE pass over this epoch yields (the
            # resumed partial epoch starts resume_skip batches in); a strict
            # step-budget break before that count leaves the epoch truncated
            # and its end hooks deferred to the run that completes it
            expected = len(loader) - (resume_skip if epoch == start_epoch else 0)
            consumed = 0
            if train_store is None:
                # host-streaming fallback: iterate the loader directly —
                # this path exists because the dataset exceeds device (and
                # possibly host) memory, so never materialize the epoch
                for batch in loader:
                    self.state, metrics = self._train_step(
                        self.state, *self._global_batch(batch["img"], batch["label"])
                    )
                    push_window(metrics)
                    step += 1
                    consumed += 1
                    meter.tick()
                    # log BEFORE the budget break (like the pretrainer): when
                    # step_budget lands on a logging boundary the final
                    # window mean must still reach the tracker
                    if step % cfg.logging_freq == 0:
                        log_step(window_means())
                    if strict and step >= step_budget:
                        break
            else:
                # HBM-resident samples: index batches are tiny; chunk them
                # into supersteps (scan of k steps per dispatch)
                batches = list(loader)
                if epoch == start_epoch and resume_skip:
                    # the checkpointed run already trained these batches
                    batches = batches[resume_skip:]
                i = 0
                while i < len(batches):
                    k = self.steps_per_call
                    fits_budget = (not strict) or (step + k <= step_budget)
                    if k > 1 and i + k <= len(batches) and fits_budget:
                        # multi-process: index batches must be GLOBAL arrays
                        # (same-seed loaders build them identically per rank)
                        chunk = put_replicated(self.mesh, np.stack(batches[i : i + k]))
                        self.state, metrics_k = self._train_superstep(
                            self.state,
                            train_store.arrays["img"],
                            train_store.arrays["label"],
                            chunk,
                        )
                        # keep metrics as DEVICE arrays: converting here
                        # would block on the just-dispatched superstep and
                        # pay up to 3 device→host fetches per chunk (~27 ms
                        # each through the tunnel) even when no logging
                        # boundary falls in it. window_means() fetches once
                        # per boundary; the epoch-end history append syncs
                        # once per epoch (same policy as Pretrainer.fit).
                        meter.tick(k)
                        # chunk-shared rates, read only when a boundary will
                        # consume them (window-reset policy on Throughput)
                        rates = meter.rates_for_chunk(step, step + k, cfg.logging_freq)
                        for j in range(k):
                            push_window(metrics_k, j)
                            step += 1
                            if step % cfg.logging_freq == 0:
                                log_step(window_means(), rates)
                        metrics = {kk: v[-1] for kk, v in metrics_k.items()}
                        i += k
                        if strict and step >= step_budget:
                            break
                        continue
                    # epoch tail / budget tail: single steps
                    batch = batches[i]
                    i += 1
                    self.state, metrics = self._train_step_idx(
                        self.state,
                        train_store.arrays["img"],
                        train_store.arrays["label"],
                        put_replicated(self.mesh, batch),
                    )
                    push_window(metrics)
                    step += 1
                    meter.tick()
                    # log-then-break, same ordering as the streaming path
                    if step % cfg.logging_freq == 0:
                        log_step(window_means())
                    if strict and step >= step_budget:
                        break
                consumed = i
            epoch_complete = consumed >= expected
            if metrics is not None:
                history["train"].append({k: float(v) for k, v in metrics.items()})

            # epoch-end hooks (validation, scheduler, epoch increment) fire
            # only for COMPLETED epochs: after a strict step-budget break
            # mid-epoch they are deferred to the run that completes the
            # epoch — a mid-epoch-save resume would otherwise run them twice
            # and silently diverge from an uninterrupted control run (same
            # policy as Pretrainer.fit's epoch_complete)
            val_mean = None
            new_best = False
            if epoch_complete and (epoch in validation_epochs or epoch == epoch_budget):
                sums = None
                for batch in val_loader:
                    if val_store is not None:
                        out = self._eval_step_idx(
                            self.state,
                            val_store.arrays["img"],
                            val_store.arrays["label"],
                            put_replicated(self.mesh, batch),
                        )
                        out = jax.tree.map(np.asarray, out)
                        sums = out if sums is None else jax.tree.map(np.add, sums, out)
                    else:
                        for ci, cl in self._window_batch(batch["img"], batch["label"]):
                            out = self._eval_step(self.state, *self._global_batch(ci, cl))
                            out = jax.tree.map(np.asarray, out)
                            sums = out if sums is None else jax.tree.map(np.add, sums, out)
                if sums is not None and sums["n_valid"] > 0:
                    nv = float(sums["n_valid"])
                    support = sums["cm"].sum(axis=1)
                    recall = np.where(
                        support > 0, np.diag(sums["cm"]) / np.maximum(support, 1), 0.0
                    )
                    present = support > 0
                    mean = {
                        "loss": float(sums["loss_num"])
                        / max(float(sums["loss_wsum"]), 1e-12),
                        "acc": float(sums["correct"]) / nv,
                        "macro_acc": float(
                            (recall * present).sum() / max(present.sum(), 1)
                        ),
                    }
                    tracker.log(
                        {
                            "epoch": epoch,
                            "val_loss": mean["loss"],
                            "val_acc": mean["acc"],
                            "val_macro_acc": mean["macro_acc"],
                        },
                        step=step,
                    )
                    history["val"].append(mean)
                    last_val_loss = mean["loss"]
                    val_mean = mean
                    if mean["acc"] > best_val_acc:
                        best_val_acc = mean["acc"]
                        history["best_val_acc"] = best_val_acc
                        new_best = True
            # reference semantics: the plateau scheduler steps at the end of
            # EVERY epoch with the (possibly stale) last mean validation loss
            # (finetune.py:221 sits outside the validation-epoch gate), so
            # bad-epoch counting advances between validations too
            if epoch_complete and last_val_loss is not None:
                self.state = self.state.replace(
                    opt_state=self.scheduler.update(self.state.opt_state, last_val_loss)
                )

            def loop_extra() -> dict:
                """Sidecar loop state consumed by resume(): everything fit()
                cannot rederive from the TrainState alone."""
                return {
                    "epoch": epoch,
                    "step": step,
                    "best_val_acc": best_val_acc,
                    "last_val_loss": last_val_loss,
                    "scheduler": self.scheduler.state_dict(),
                }

            # checkpoint saves happen AFTER the every-epoch scheduler update,
            # so a restored checkpoint carries the post-epoch LR and plateau
            # counters (resume-exactness; params are unaffected by ordering)
            saved_this_epoch = False
            if val_mean is not None and save_checkpoints:
                # gated behind a validation having RUN, like the reference,
                # whose saves live inside validate_downstream
                # (src/utils.py:584-604) — a checkpoint_save_epoch that is
                # not also a validation epoch never saves there either. The
                # done() fallback below still guarantees the run can't END
                # without a resumable checkpoint.
                save_now = (
                    epoch == epoch_budget
                    or epoch in cfg.get("checkpoint_save_epochs", [])
                )
                if save_now:
                    save_checkpoint(
                        os.path.join(run_dir, f"{cfg.method_name}_at_ep{epoch}.msgpack"),
                        self.state,
                        cfg,
                        extra=loop_extra(),
                    )
                    saved_this_epoch = True
                if new_best:
                    save_checkpoint(
                        os.path.join(run_dir, f"best_{cfg.method_name}.msgpack"),
                        self.state,
                        cfg,
                        extra={**loop_extra(), "val_acc": best_val_acc},
                    )
                    saved_this_epoch = True
            if epoch_complete:
                epoch += 1
            # a budget ending must always leave a resumable full-state
            # checkpoint at the stopping point — this is what makes resume
            # possible at all. Cases: (a) mid-epoch step-budget break (epoch
            # hooks deferred to the resumed process), (b) the step budget
            # landing EXACTLY on an epoch boundary whose epoch saved nothing
            # (not a validation/save epoch) — without this, max_steps % spe
            # == 0 would end the run with no checkpoint while max_steps-1
            # would have saved one — (c) the EPOCH budget exhausting on such
            # an epoch (the in-loop `epoch == epoch_budget` save gate is
            # unreachable in strict mode, where done() exits at epoch >=
            # epoch_budget), and (d) a NON-strict (config-budget) run whose
            # step budget dominates: it can run far past cfg.epoch saving
            # only on new-best, and would otherwise end with its final state
            # nowhere on disk. done() re-evaluated after the epoch increment
            # is exactly the "loop exits now" predicate in every regime.
            if save_checkpoints and done() and (
                not epoch_complete or not saved_this_epoch
            ):
                save_checkpoint(
                    os.path.join(run_dir, f"{cfg.method_name}_at_step{step}.msgpack"),
                    self.state,
                    cfg,
                    extra=loop_extra(),
                )
            if len(loader) == 0:
                break

        history["throughput"] = meter.stats()
        return history
