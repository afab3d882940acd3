"""SimMIM masked pre-training loop (reference driver pretrain.py:30-197).

TPU-native structure: ONE jitted ``train_step(state, tiles) -> (state,
metrics)`` containing random crop + mask sampling + fwd + bwd + AdamW update,
with the batch sharded over the ``data`` mesh axis and params replicated —
XLA inserts the gradient ``psum`` over ICI. Buffers are donated, so params
and optimizer state update in place in HBM.

Differences from the reference worth knowing:
* the random 8x8 crop of each 64x64 tile happens on-device via
  ``dynamic_slice`` from the carried RNG (reference crops on the host with a
  single (x, y) per batch, pretrain.py:99-107 — same distribution here);
* the NaN guard checks metrics at logging frequency instead of a blocking
  per-step device sync (raises like pretrain.py:113-114);
* checkpoints carry the full TrainState (resume-exact), not just weights.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from maskedsst_tpu.config import Config
from maskedsst_tpu.data.pipeline import DataLoader, split_dataset
from maskedsst_tpu.models import SimMIMSpatialSpectral, ViTSpatialSpectral
from maskedsst_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    global_streamed_batch,
    put_replicated,
    replicate,
)
from maskedsst_tpu.train.checkpoint import save_checkpoint
from maskedsst_tpu.train.optim import (
    CosineAnnealingLR,
    ReduceLROnPlateau,
    build_optimizer,
    get_learning_rates,
)
from maskedsst_tpu.train.train_state import TrainState
from maskedsst_tpu.train.windows import window_tiles
from maskedsst_tpu.utils.tracking import Throughput, Tracker


def default_fused() -> bool:
    """Use the fused Pallas transformer kernel on TPU backends."""
    import jax as _jax

    return _jax.default_backend() not in ("cpu",)


def build_pretrain_model(config: Config, dtype=None, mesh=None) -> SimMIMSpatialSpectral:
    """Encoder + SimMIM wrapper from a merged pretrain config
    (pretrain.py:40-67). ``mesh`` routes the fused kernels' explicit
    data-axis shard_map on multi-device meshes."""
    assert config.encoder_name == "ViTSpatialSpectral", (
        f"encoder {config.encoder_name} not available"
    )
    fused = config.get("fused")
    if fused is None:
        fused = default_fused()
    from maskedsst_tpu.train.factory import check_fused_mesh

    check_fused_mesh(fused, mesh)
    encoder = ViTSpatialSpectral(
        image_size=config.image_size,
        spatial_patch_size=config.patch_size,
        spectral_patch_size=config.band_patch_size,
        num_classes=config.n_classes,
        dim=config.transformer_dim,
        depth=config.transformer_depth,
        heads=config.transformer_n_heads,
        mlp_dim=config.transformer_mlp_dim,
        dropout=config.transformer_dropout,
        emb_dropout=config.transformer_emb_dropout,
        channels=config.n_bands,
        spectral_pos_embed=config.spectral_pos_embed,
        spectral_pos=list(range(config.n_bands // config.band_patch_size)),
        blockwise_patch_embed=config.blockwise_patch_embed,
        spectral_only=config.spectral_only,
        dtype=dtype,
        fused=fused,
        mesh=mesh if fused else None,
    )
    return SimMIMSpatialSpectral(
        encoder=encoder,
        masking_ratio=config.mim_masking_ratio,
        mask_patch_size=config.mim_mask_patch_size,
        tube_masking=config.tube_masking,
        to_pixels_per_spectral_block=config.to_pixels_per_spectral_block,
        intermediate_losses=config.mim_intermediate_losses,
        dtype=dtype,
    )


class Pretrainer:
    def __init__(
        self,
        config: Config,
        mesh=None,
        dtype: Optional[jnp.dtype] = None,
        tile_size: int = 64,
    ):
        self.config = config
        self.mesh = mesh if mesh is not None else get_mesh()
        self.tile_size = tile_size
        n_data = self.mesh.shape.get("data", 1)
        if config.batch_size % n_data != 0:
            # unlike the Finetuner (whose ignored-label rows are
            # loss-neutral), the SimMIM loss normalizes over the true batch
            # — the trainer cannot pad silently, and a non-divisible batch
            # drops the fused kernels to the GSPMD fallback (possible
            # all-gather of the batch onto every chip). Warn up front;
            # data_axis_or_warn repeats the warning at each trace.
            import warnings

            warnings.warn(
                f"batch_size={config.batch_size} is not a multiple of the "
                f"data mesh axis ({n_data}): data-parallel sharding of the "
                "fused kernels falls back to GSPMD (perf cliff). Use a "
                "batch that divides the data axis for production runs.",
                stacklevel=2,
            )
        self.model = build_pretrain_model(config, dtype=dtype, mesh=self.mesh)

        tx = build_optimizer(
            config.optimizer,
            config.lr,
            config.weight_decay,
            grad_clamp=1.0 if config.get("clip_grad_norm") else None,
            flatten=True,  # checkpoint-state stability (device time is a
            # wash vs per-leaf — measured, see flatten_transform docstring)
        )
        rng = jax.random.PRNGKey(config.get("seed", 5))
        init_rng, state_rng = jax.random.split(rng)
        # init at the data-axis batch so the fused kernels' shard_map guard
        # never warns/falls back during the init trace
        sample = jnp.zeros(
            (n_data, config.n_bands, config.image_size, config.image_size),
            jnp.float32,
        )
        init_fn = jax.jit(
            partial(self.model.init, deterministic=True)
        )  # jit: eager init costs ~1 min of per-op dispatch on TPU
        params = init_fn(
            {"params": init_rng, "mask": jax.random.PRNGKey(0)}, sample
        )["params"]
        self.state = TrainState.create(params, tx, state_rng)
        self.state = jax.device_put(self.state, replicate(self.mesh))
        self.num_params = sum(p.size for p in jax.tree.leaves(params))

        if config.scheduler == "ReduceLROnPlateau":
            self.scheduler = ReduceLROnPlateau(factor=0.9, patience=5)
        elif config.scheduler == "cosine":
            self.scheduler = CosineAnnealingLR(config.lr, t_max=50)
        elif config.scheduler in (None, "", "none", "None"):
            self.scheduler = None
        else:
            # a typo'd value (e.g. the torch class name "CosineAnnealingLR")
            # used to silently disable LR scheduling — constant-LR training
            # whose divergence only shows in final loss
            raise ValueError(
                f"unknown scheduler {config.scheduler!r}: use "
                "'ReduceLROnPlateau', 'cosine', or none"
            )

        self._batch_shard = batch_sharding(self.mesh)
        self._replicated = replicate(self.mesh)
        crop = config.image_size != tile_size and config.dataset in ("dfc", "enmap")
        self._train_step = jax.jit(
            partial(self._step, crop=crop, train=True),
            in_shardings=(self._replicated, self._batch_shard),
            out_shardings=(self._replicated, self._replicated),
            donate_argnums=(0,),
        )
        # HBM-resident variant: tiles stay on device, only [B] indices move
        self._train_step_idx = jax.jit(
            partial(self._step_idx, crop=crop, train=True),
            in_shardings=(self._replicated, self._replicated, self._replicated),
            out_shardings=(self._replicated, self._replicated),
            donate_argnums=(0,),
        )
        # superstep: scan steps_per_call steps inside ONE dispatch — the
        # host↔device round trip per call (~27 ms on tunneled backends)
        # amortizes across K steps
        self.steps_per_call = int(config.get("steps_per_call", 16))
        self._train_superstep = jax.jit(
            partial(self._superstep, crop=crop),
            in_shardings=(self._replicated, self._replicated, self._replicated),
            out_shardings=(self._replicated, self._replicated),
            donate_argnums=(0,),
        )
        self._val_step = jax.jit(
            partial(self._step_val),
            in_shardings=(self._replicated, self._batch_shard, None),
            out_shardings=self._replicated,
        )
        self._val_step_idx = jax.jit(
            self._step_val_idx,
            in_shardings=(self._replicated, self._replicated, self._replicated, None),
            out_shardings=self._replicated,
        )

    # --- jitted bodies ------------------------------------------------------
    def _loss(self, params, img, mask_rng, dropout_rng, train: bool):
        return self.model.apply(
            {"params": params},
            img,
            deterministic=not train,
            mask_rng=mask_rng,
            rngs={"dropout": dropout_rng} if train else {},
        )

    def _step(self, state: TrainState, tiles, *, crop: bool, train: bool):
        rng, crop_rng, mask_rng, drop_rng = jax.random.split(state.rng, 4)
        s = self.config.image_size
        if crop:
            # one random (x, y) for the whole batch, like pretrain.py:99-107
            xy = jax.random.randint(crop_rng, (2,), 0, self.tile_size - s)
            img = jax.lax.dynamic_slice(
                tiles,
                (0, 0, xy[0], xy[1]),
                (tiles.shape[0], tiles.shape[1], s, s),
            )
        else:
            img = tiles[:, :, :s, :s]
        return self._update(state, img, rng, mask_rng, drop_rng, train)

    def _update(self, state: TrainState, img, rng, mask_rng, drop_rng, train: bool):
        loss, grads = jax.value_and_grad(self._loss)(
            state.params, img, mask_rng, drop_rng, train
        )
        state = state.apply_gradients(grads).replace(rng=rng)
        metrics = {"loss": loss}
        if self.config.get("log_grad_norm", False):
            metrics["grad_norm"] = optax.global_norm(grads)
        return state, metrics

    def _gather(self, store_tiles, idx):
        """[N, C, t, t] resident tiles + [B] indices → batch resharded onto
        the data axis (gather is local; only compute splits across chips)."""
        batch = jnp.take(store_tiles, idx, axis=0)
        return jax.lax.with_sharding_constraint(batch, self._batch_shard)

    def _gather_crop(self, store_tiles, idx, xy, s: int):
        """Fused gather + crop: reads only the [B, C, s, s] crop windows from
        the HBM store instead of whole tiles (full 64x64 tiles would move
        ~32x more bytes — measured ~2 ms/step at the reference recipe)."""
        c = store_tiles.shape[1]

        def one(i):
            return jax.lax.dynamic_slice(
                store_tiles, (i, 0, xy[0], xy[1]), (1, c, s, s)
            )[0]

        batch = jax.vmap(one)(idx)
        return jax.lax.with_sharding_constraint(batch, self._batch_shard)

    def _step_idx(self, state: TrainState, store_tiles, idx, *, crop: bool, train: bool):
        rng, crop_rng, mask_rng, drop_rng = jax.random.split(state.rng, 4)
        s = self.config.image_size
        if crop:
            # same key/draw order as _step: identical crop distribution
            xy = jax.random.randint(crop_rng, (2,), 0, self.tile_size - s)
            img = self._gather_crop(store_tiles, idx, xy, s)
        else:
            img = self._gather(store_tiles, idx)[:, :, :s, :s]
        return self._update(state, img, rng, mask_rng, drop_rng, train)

    def _step_val_idx(self, state: TrainState, store_tiles, idx, mask_rng):
        return self._step_val(state, self._gather(store_tiles, idx), mask_rng)

    def _superstep(self, state: TrainState, store_tiles, idx_chunk, *, crop: bool):
        """idx_chunk [K, B] → K sequential train steps in one dispatch."""

        def body(state, idx):
            state, metrics = self._step_idx(
                state, store_tiles, idx, crop=crop, train=True
            )
            return state, metrics["loss"]

        state, losses = jax.lax.scan(body, state, idx_chunk)
        return state, losses

    def _step_val(self, state: TrainState, tiles, mask_rng):
        """Sliding window (stride = window) over the tile
        (pretrain.py:166-184 loops windows serially; vectorizing over windows
        is loss-equivalent because all windows have the same element count).
        Windows run in bounded chunks via lax.map so the x(tile/s)^2 batch
        expansion never exceeds HBM. Datasets whose samples are already at
        image_size (e.g. houston2018 patches) skip the expansion, like the
        reference's non-tile validation branch."""
        s = self.config.image_size
        c = tiles.shape[1]
        (windows,) = window_tiles(tiles, s)
        n = windows.shape[0]
        from maskedsst_tpu.ops.fused_layer import largest_divisor

        chunk = largest_divisor(n, 512)  # keeps odd window counts vectorized
        windows = windows.reshape(n // chunk, chunk, c, s, s)

        def one(args):
            i, w = args
            key = jax.random.fold_in(mask_rng, i)
            return self._loss(state.params, w, key, key, train=False)

        losses = jax.lax.map(one, (jnp.arange(n // chunk), windows))
        return losses.mean()

    def resume(self, path: str) -> int:
        """Restore the FULL train state (params, optimizer moments, step,
        RNG) from a checkpoint — exact resume, which the reference cannot do
        (it never saves optimizer state, SURVEY.md §5.4). The host-side LR
        scheduler restores from the metadata sidecar so the LR trajectory
        continues rather than restarting. Returns the step."""
        from maskedsst_tpu.train.checkpoint import load_metadata, restore_checkpoint

        self.state = restore_checkpoint(path, self.state)
        self.state = jax.device_put(self.state, self._replicated)
        try:
            sched = load_metadata(path).get("extra", {}).get("scheduler")
        except FileNotFoundError:
            sched = None
        if sched and self.scheduler is not None:
            self.scheduler.load_state_dict(sched)
        return int(self.state.step)

    def _put_replicated(self, a):
        """Index vectors → device arrays consumable by the global jitted
        step (parallel.mesh.put_replicated over this trainer's mesh)."""
        return put_replicated(self.mesh, a)

    def _global_batch(self, img):
        """Host-streamed image batch → global array sharded on the data
        axis (parallel.mesh.global_streamed_batch over this trainer's
        mesh): each process contributes its row slice of the identically
        constructed, same-seed batch."""
        return global_streamed_batch(self.mesh, np.asarray(img))

    def _scheduler_extra(self) -> dict:
        return (
            {"scheduler": self.scheduler.state_dict()} if self.scheduler is not None else {}
        )

    # --- loop ---------------------------------------------------------------
    def fit(
        self,
        dataset,
        epochs: Optional[int] = None,
        max_steps: Optional[int] = None,
        tracker: Optional[Tracker] = None,
        models_dir: str = "models",
        save_checkpoints: bool = True,
    ) -> dict:
        cfg = self.config
        tracker = tracker or Tracker("enmap-mim-spatial-spectral", cfg, use_wandb=None)
        cfg.run_id = tracker.run_id
        cfg.model_params = self.num_params
        tracker.update_config(cfg)
        run_dir = os.path.join(models_dir, str(cfg.run_id))
        # only process 0 touches the filesystem (see finetuner.fit)
        if save_checkpoints and jax.process_index() == 0:
            os.makedirs(run_dir, exist_ok=True)

        val_ds, train_ds = split_dataset(
            dataset, cfg.train_fraction, cfg.data_fraction, cfg.get("seed", 5)
        )

        # prefer HBM-resident tiles (index-only host→device traffic); fall
        # back to streaming loaders when the set exceeds the HBM budget, or
        # when the dataset draws fresh random samples per __getitem__ (a
        # one-time materialization would freeze its distribution — e.g.
        # houston2018 random-patch mode)
        train_store = val_store = None
        if cfg.get("device_data", True) and not getattr(train_ds, "stochastic", False):
            try:
                from maskedsst_tpu.data.device_store import DeviceTileStore, IndexBatcher

                train_store = DeviceTileStore(train_ds, self.mesh)
                if len(val_ds) >= cfg.batch_size:
                    val_store = DeviceTileStore(val_ds, self.mesh)
            except MemoryError as exc:
                print(f"[pretrain] streaming from host: {exc}")
                train_store = val_store = None

        if train_store is not None:
            loader = IndexBatcher(
                len(train_store), cfg.batch_size, shuffle=True, drop_last=True,
                seed=cfg.get("seed", 5),
            )
            val_loader = IndexBatcher(
                len(val_store) if val_store else 0, cfg.batch_size,
                shuffle=False, drop_last=True,
            ) if val_store else []
            if not cfg.get("skip_val", False) and val_store is None:
                print(
                    f"[pretrain] WARNING: val split ({len(val_ds)} tiles) is "
                    f"smaller than batch_size ({cfg.batch_size}); no "
                    "validation will run and ReduceLROnPlateau will never "
                    "step (the reference's drop_last=True val loader is "
                    "empty in this regime too, src/utils.py:127-130)"
                )
        else:
            loader = DataLoader(
                train_ds, cfg.batch_size, shuffle=True, drop_last=True, seed=cfg.get("seed", 5)
            )
            val_loader = DataLoader(
                val_ds, cfg.batch_size, shuffle=False, drop_last=True, seed=0
            )

        epochs = epochs if epochs is not None else cfg.epoch
        meter = Throughput(cfg.batch_size, num_chips=self.mesh.devices.size)
        meter.start()
        # continue counters after resume(): step/epoch/log axis keep their
        # original origin instead of restarting at 0 (max_steps reads as a
        # TOTAL step cap either way)
        step = int(self.state.step)
        steps_per_epoch = max(1, len(loader)) if hasattr(loader, "__len__") else None
        start_epoch = step // steps_per_epoch if steps_per_epoch else 0
        # fast-forward the loader's shuffle epoch so a resumed run continues
        # the permutation sequence at start_epoch instead of replaying the
        # epoch-0..k batch orders already trained before the checkpoint.
        # A mid-epoch checkpoint (max_steps truncation) additionally skips
        # the first `resume_skip` batches of epoch start_epoch — already
        # trained before the save — and the truncated epoch's end hooks
        # (marker, val, scheduler) are deferred to its true completion (see
        # epoch_complete below), so resume is exact in every regime.
        if start_epoch and hasattr(loader, "epoch"):
            loader.epoch = start_epoch
        resume_skip = step - start_epoch * steps_per_epoch if steps_per_epoch else 0
        if resume_skip and isinstance(loader, DataLoader):
            # index-level skip: the streamed loader must not read (or
            # prefetch) tiles for batches the checkpointed run already
            # trained; the store path slices its index list instead
            loader.skip_next = resume_skip
        # per-step losses, kept as device scalars until a logging boundary
        # (converting every step would serialize dispatch on tunneled
        # backends); only the trailing window is ever converted
        loss_window: list = []
        model_save_freq = cfg.model_save_freq
        if start_epoch > 10 and model_save_freq == 1:
            model_save_freq = 10  # the epoch-10 switch already fired pre-resume
        history = {"train_loss": [], "val_loss": []}

        # log_grad_norm is honored on the single-step paths (their metrics
        # dict carries it); the superstep scan returns the loss vector only,
        # so the debug flag forces steps_per_call down to 1 — debugging
        # gradient health trumps dispatch amortization
        log_gn = bool(cfg.get("log_grad_norm", False))
        gn_window: list = []

        def log_maybe(epoch, prev_step):
            nonlocal loss_window, gn_window
            freq = cfg.logging_freq
            # chunk-average rates shared by every boundary row this chunk
            # emits; None = no boundary crossed, nothing to log (the
            # crossing predicate and window-reset policy live on Throughput)
            rates = meter.rates_for_chunk(prev_step, step, freq)
            if rates is None:
                return
            # reference logs the mean over the last logging_freq steps every
            # logging_freq steps (pretrain.py:122-130). A superstep chunk can
            # cross several boundaries at once — emit one entry per boundary,
            # each windowed at its own step, so the log stream matches the
            # per-step paths. One host fetch per stored chunk.
            flat = np.concatenate(
                [np.atleast_1d(np.asarray(x)) for x in loss_window]
            ) if loss_window else np.empty((0,))
            flat_gn = np.concatenate(
                [np.atleast_1d(np.asarray(x)) for x in gn_window]
            ) if gn_window else None
            # lr is constant within a chunk (schedulers step between epochs,
            # reference pretrain.py:194-197), so one read serves every
            # boundary entry; meter stats are windowed rates, same deal
            lr = (get_learning_rates(self.state.opt_state) or [cfg.lr])[0]
            for b in range((prev_step // freq + 1) * freq, step + 1, freq):
                # flat's last element is the loss of `step`; slice the
                # freq-long window ending at boundary step b
                end = flat.size - (step - b)
                window = flat[max(0, end - freq) : end]
                loss = float(window.mean()) if window.size else float("nan")
                if np.isnan(loss):
                    raise ValueError("Loss is NaN")
                row = {"epoch": epoch, "loss": loss, "lr": lr, **rates}
                if flat_gn is not None:
                    gn_end = flat_gn.size - (step - b)
                    gw = flat_gn[max(0, gn_end - freq) : gn_end]
                    if gw.size:
                        row["grad_norm"] = float(gw.mean())
                tracker.log(row, step=b)
            loss_window = [flat[-freq:]]
            if flat_gn is not None:
                gn_window = [flat_gn[-freq:]]

        for epoch in range(start_epoch, epochs):
            # budget check BEFORE any dispatch: entering fit() with the
            # restored step already at/above max_steps must train nothing —
            # the streamed path's in-loop check fires only AFTER a step, so
            # without this a resumed-past-budget run would train (and
            # checkpoint) one extra step and diverge from the store path
            if max_steps is not None and step >= max_steps:
                break
            metrics = None  # guards empty loaders (train set < batch_size)
            if train_store is not None:
                # scan steps_per_call steps per dispatch (full chunks only;
                # the remainder runs through the single-step path)
                idx_batches = list(loader)
                if epoch == start_epoch and resume_skip:
                    idx_batches = idx_batches[resume_skip:]
                k = 1 if log_gn else max(1, self.steps_per_call)
                pos = 0
                while pos < len(idx_batches):
                    prev_step = step
                    chunk = idx_batches[pos : pos + k]
                    if max_steps is not None:
                        chunk = chunk[: max(0, max_steps - step)]
                        if not chunk:
                            break
                    pos += len(chunk)
                    if len(chunk) == k and k > 1:
                        self.state, chunk_losses = self._train_superstep(
                            self.state,
                            train_store.arrays["img"],
                            self._put_replicated(np.stack(chunk)),
                        )
                        metrics = {"loss": chunk_losses[-1]}
                        # append the WHOLE loss vector: one host fetch per
                        # stored chunk in log_maybe (extend would split it
                        # into per-step device scalars = one ~27 ms tunnel
                        # round trip each)
                        loss_window.append(chunk_losses)
                        step += len(chunk)
                        meter.tick(len(chunk))
                    else:
                        for idx in chunk:
                            self.state, metrics = self._train_step_idx(
                                self.state, train_store.arrays["img"],
                                self._put_replicated(idx),
                            )
                            loss_window.append(metrics["loss"])
                            if log_gn and "grad_norm" in metrics:
                                gn_window.append(metrics["grad_norm"])
                            step += 1
                            meter.tick()
                    log_maybe(epoch, prev_step)
                    if max_steps is not None and step >= max_steps:
                        break
            else:
                for batch in loader:
                    prev_step = step
                    self.state, metrics = self._train_step(
                        self.state, self._global_batch(batch["img"])
                    )
                    loss_window.append(metrics["loss"])
                    if log_gn and "grad_norm" in metrics:
                        gn_window.append(metrics["grad_norm"])
                    step += 1
                    meter.tick()
                    log_maybe(epoch, prev_step)
                    if max_steps is not None and step >= max_steps:
                        break
            # epoch-end hooks (marker log, val, scheduler) fire only for
            # COMPLETED epochs: a max_steps break mid-epoch must not step
            # the scheduler or consume a val loss — after a mid-epoch-save
            # resume those hooks would fire AGAIN at the true epoch end and
            # the LR trajectory would silently diverge from an uninterrupted
            # run. The checkpoint save stays unconditional: saving at the
            # break is what makes mid-epoch resume possible at all.
            epoch_complete = (
                steps_per_epoch is None or step >= (epoch + 1) * steps_per_epoch
            )
            if metrics is not None and epoch_complete:
                # end-of-epoch marker: the LAST step's raw loss at the same
                # step as the validation stats (reference pretrain.py:132)
                last = float(jax.device_get(metrics["loss"]))
                history["train_loss"].append(last)
                tracker.log({"epoch": epoch, "loss": last}, step=step)

            if not cfg.get("skip_val", False) and epoch_complete:
                val_losses = []
                for vi, batch in enumerate(val_loader):
                    vkey = jax.random.fold_in(jax.random.PRNGKey(7), epoch * 10000 + vi)
                    if train_store is not None:
                        vloss = self._val_step_idx(
                            self.state, val_store.arrays["img"],
                            self._put_replicated(batch), vkey,
                        )
                    else:
                        vloss = self._val_step(
                            self.state, self._global_batch(batch["img"]), vkey
                        )
                    val_losses.append(float(vloss))
                if val_losses:
                    val_loss = float(np.mean(val_losses))
                    history["val_loss"].append(val_loss)
                    tracker.log({"epoch": epoch, "val_loss": val_loss}, step=step)
                    if isinstance(self.scheduler, ReduceLROnPlateau):
                        self.state = self.state.replace(
                            opt_state=self.scheduler.update(self.state.opt_state, val_loss)
                        )
            if isinstance(self.scheduler, CosineAnnealingLR) and epoch_complete:
                self.state = self.state.replace(
                    opt_state=self.scheduler.update(self.state.opt_state)
                )
            # epoch checkpoints save AFTER the epoch's validation/scheduler
            # updates and only for COMPLETED epochs, so model_*_ep{N} carries
            # the post-epoch LR + scheduler counters and resume() continues
            # the LR trajectory exactly (the pre-round-5 ordering saved the
            # PRE-update scheduler state — a resumed cosine run would lag the
            # control by one epoch of annealing forever; same policy as
            # Finetuner.fit). The reference saves before validation
            # (pretrain.py:135-151) but its checkpoints carry weights only,
            # so only the sidecar is affected by the ordering.
            saved_this_epoch = False
            if save_checkpoints and epoch_complete and epoch % model_save_freq == 0:
                save_checkpoint(
                    os.path.join(run_dir, f"model_{cfg.encoder_name}_ep{epoch}.msgpack"),
                    self.state,
                    cfg,
                    extra={"epoch": epoch, **self._scheduler_extra()},
                )
                saved_this_epoch = True
            if epoch == 10 and model_save_freq == 1 and epoch_complete:
                model_save_freq = 10  # pretrain.py:150-151
            if max_steps is not None and step >= max_steps:
                # a max_steps break must always leave a resumable full-state
                # checkpoint at the stopping point (mid-epoch, or a completed
                # final epoch off the save frequency) — same guarantee as
                # Finetuner.fit's run_ending save
                if save_checkpoints and not saved_this_epoch:
                    save_checkpoint(
                        os.path.join(
                            run_dir,
                            f"model_{cfg.encoder_name}_at_step{step}.msgpack",
                        ),
                        self.state,
                        cfg,
                        extra={"epoch": epoch, **self._scheduler_extra()},
                    )
                break

        history["throughput"] = meter.stats()
        return history
