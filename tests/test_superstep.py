"""Superstep (scan-K-steps-per-dispatch) equivalence: K steps through the
scanned superstep must produce bit-identical state evolution to K single
steps (same RNG threading, same gathers)."""

import jax
import jax.numpy as jnp
import numpy as np

from maskedsst_tpu.config import get_pretrain_config
from maskedsst_tpu.data.device_store import DeviceTileStore, IndexBatcher
from maskedsst_tpu.data.synthetic import SyntheticCubeDataset
from maskedsst_tpu.train.pretrainer import Pretrainer


def test_superstep_equals_single_steps():
    cfg = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    cfg.n_bands = 40
    cfg.transformer_dim = 24
    cfg.transformer_depth = 2
    cfg.transformer_n_heads = 2
    cfg.transformer_mlp_dim = 16
    cfg.batch_size = 8
    cfg.steps_per_call = 3

    tr = Pretrainer(cfg)
    ds = SyntheticCubeDataset(num_tiles=24, n_bands=40, labeled=False)
    store = DeviceTileStore(ds, tr.mesh)
    idx = np.stack(list(IndexBatcher(len(store), 8, shuffle=True, drop_last=True, seed=0)))[:3]

    state_a = tr.state
    for i in range(3):
        state_a, m = tr._train_step_idx(state_a, store.arrays["img"], jnp.asarray(idx[i]))

    # fresh trainer for an identical starting state (the first run donated its
    # buffers)
    tr2 = Pretrainer(cfg)
    state_b, losses = tr2._train_superstep(
        tr2.state, store.arrays["img"], jnp.asarray(idx)
    )

    np.testing.assert_allclose(
        np.asarray(m["loss"]), np.asarray(losses[-1]), rtol=1e-6
    )
    for pa, pb in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=2e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(state_a.rng), np.asarray(state_b.rng))


def test_pretrainer_fit_uses_superstep():
    cfg = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    cfg.n_bands = 40
    cfg.transformer_dim = 24
    cfg.transformer_depth = 2
    cfg.transformer_n_heads = 2
    cfg.transformer_mlp_dim = 16
    cfg.batch_size = 4
    cfg.steps_per_call = 2
    cfg.skip_val = True
    cfg.logging_freq = 2

    tr = Pretrainer(cfg)
    ds = SyntheticCubeDataset(num_tiles=30, n_bands=40, labeled=False)
    hist = tr.fit(ds, epochs=2, save_checkpoints=False)
    assert len(hist["train_loss"]) == 2
    assert np.isfinite(hist["train_loss"]).all()


def test_finetuner_superstep_equals_single_steps():
    from maskedsst_tpu.config import get_finetune_config
    from maskedsst_tpu.models import ViTSpatialSpectral
    from maskedsst_tpu.train.finetuner import Finetuner

    def tiny(cfg):
        cfg.n_bands = 40
        cfg.transformer_dim = 24
        cfg.transformer_depth = 2
        cfg.transformer_n_heads = 2
        cfg.transformer_mlp_dim = 16
        cfg.batch_size = 6
        cfg.steps_per_call = 3
        return cfg

    def mk():
        cfg = tiny(get_finetune_config("configs/finetune_config_enmap.yaml", "configs/config.yaml"))
        model = ViTSpatialSpectral(
            image_size=cfg.image_size,
            spatial_patch_size=cfg.patch_size,
            spectral_patch_size=cfg.band_patch_size,
            num_classes=cfg.n_classes,
            dim=cfg.transformer_dim,
            depth=cfg.transformer_depth,
            heads=cfg.transformer_n_heads,
            mlp_dim=cfg.transformer_mlp_dim,
            channels=cfg.n_bands,
            spectral_pos=cfg.spectral_pos[:4],
        )
        ft = Finetuner(cfg, model)
        return cfg, ft

    cfg, ft = mk()
    ds = SyntheticCubeDataset(num_tiles=24, n_bands=40, n_classes=cfg.n_classes)
    store = DeviceTileStore(ds, ft.mesh)
    idx = np.stack(list(IndexBatcher(len(store), 6, shuffle=True, drop_last=True, seed=0)))[:3]

    state_a = ft.state
    for i in range(3):
        state_a, m = ft._train_step_idx(
            state_a, store.arrays["img"], store.arrays["label"], jnp.asarray(idx[i])
        )

    _, ft2 = mk()
    state_b, metrics = ft2._train_superstep(
        ft2.state, store.arrays["img"], store.arrays["label"], jnp.asarray(idx)
    )

    np.testing.assert_allclose(
        np.asarray(m["loss"]), np.asarray(metrics["loss"][-1]), rtol=1e-6
    )
    for pa, pb in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=2e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(state_a.rng), np.asarray(state_b.rng))


def test_exact_resume(tmp_path):
    """Save mid-training, resume into a fresh trainer, continue — the final
    state must be bit-identical to an uninterrupted run (full TrainState
    checkpoint: params, optimizer moments, step, RNG; SURVEY.md §5.4 notes
    the reference cannot do this)."""
    from maskedsst_tpu.train.checkpoint import save_checkpoint

    cfg = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    cfg.n_bands = 40
    cfg.transformer_dim = 24
    cfg.transformer_depth = 2
    cfg.transformer_n_heads = 2
    cfg.transformer_mlp_dim = 16
    cfg.batch_size = 8

    tr = Pretrainer(cfg)
    ds = SyntheticCubeDataset(num_tiles=40, n_bands=40, labeled=False)
    store = DeviceTileStore(ds, tr.mesh)
    idx = np.stack(list(IndexBatcher(len(store), 8, shuffle=True, drop_last=True, seed=0)))[:4]

    # uninterrupted: 4 steps
    state = tr.state
    for i in range(4):
        state, _ = tr._train_step_idx(state, store.arrays["img"], jnp.asarray(idx[i]))

    # interrupted: 2 steps, checkpoint, resume in a NEW trainer, 2 more
    tr2 = Pretrainer(cfg)
    s2 = tr2.state
    for i in range(2):
        s2, _ = tr2._train_step_idx(s2, store.arrays["img"], jnp.asarray(idx[i]))
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, s2, config=cfg)

    tr3 = Pretrainer(cfg)
    assert tr3.resume(path) == 2
    s3 = tr3.state
    for i in range(2, 4):
        s3, _ = tr3._train_step_idx(s3, store.arrays["img"], jnp.asarray(idx[i]))

    assert int(s3.step) == int(state.step) == 4
    np.testing.assert_array_equal(np.asarray(s3.rng), np.asarray(state.rng))
    for pa, pb in zip(jax.tree.leaves(state.params), jax.tree.leaves(s3.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for oa, ob in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(s3.opt_state)):
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_fit_continues_counters_after_resume(tmp_path):
    """fit() after resume() continues the step axis and treats max_steps as
    a TOTAL cap: a run resumed at step 4 with max_steps=8 performs exactly
    4 more steps and logs them at steps 5..8, not 1..4."""
    from maskedsst_tpu.train.checkpoint import save_checkpoint
    from maskedsst_tpu.utils.tracking import Tracker

    class Capture(Tracker):
        def __init__(self):
            super().__init__("test", use_wandb=False, quiet=True)
            self.rows = []

        def log(self, scalars, step=None):
            self.rows.append((step, dict(scalars)))

    cfg = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    cfg.n_bands = 40
    cfg.transformer_dim = 24
    cfg.transformer_depth = 2
    cfg.transformer_n_heads = 2
    cfg.transformer_mlp_dim = 16
    cfg.batch_size = 8
    cfg.steps_per_call = 2
    cfg.logging_freq = 2
    cfg.skip_val = True

    ds = SyntheticCubeDataset(num_tiles=64, n_bands=40, labeled=False)
    tr = Pretrainer(cfg)
    tr.fit(ds, epochs=10, max_steps=4, tracker=Capture(),
           save_checkpoints=False, models_dir=str(tmp_path))
    assert int(tr.state.step) == 4
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, tr.state, config=cfg)

    tr2 = Pretrainer(cfg)
    assert tr2.resume(path) == 4
    cap = Capture()
    tr2.fit(ds, epochs=10, max_steps=8, tracker=cap,
            save_checkpoints=False, models_dir=str(tmp_path))
    assert int(tr2.state.step) == 8
    logged_steps = [s for s, m in cap.rows if "loss" in m and "lr" in m]
    assert logged_steps and all(s > 4 for s in logged_steps), logged_steps


def test_resume_continues_shuffle_sequence(tmp_path):
    """A run resumed at an epoch boundary must continue the per-epoch
    shuffle sequence at start_epoch, not replay the epoch-0 permutation:
    final params of interrupted+resumed training are bit-identical to the
    uninterrupted control (fit() fast-forwards loader.epoch after resume)."""
    from maskedsst_tpu.train.checkpoint import save_checkpoint

    def mk():
        cfg = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
        cfg.n_bands = 40
        cfg.transformer_dim = 24
        cfg.transformer_depth = 2
        cfg.transformer_n_heads = 2
        cfg.transformer_mlp_dim = 16
        cfg.batch_size = 8
        cfg.steps_per_call = 2
        cfg.logging_freq = 1000
        cfg.skip_val = True
        return cfg

    ds = SyntheticCubeDataset(num_tiles=32, n_bands=40, labeled=False)

    # control: 2 uninterrupted epochs
    tr = Pretrainer(mk())
    tr.fit(ds, epochs=2, save_checkpoints=False, models_dir=str(tmp_path))
    steps_total = int(tr.state.step)

    # interrupted: 1 epoch, checkpoint, resume in a fresh trainer, 1 more
    tr1 = Pretrainer(mk())
    tr1.fit(ds, epochs=1, save_checkpoints=False, models_dir=str(tmp_path))
    steps_1ep = int(tr1.state.step)
    assert 0 < steps_1ep < steps_total
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, tr1.state, config=tr1.config)

    tr2 = Pretrainer(mk())
    assert tr2.resume(path) == steps_1ep
    tr2.fit(ds, epochs=2, save_checkpoints=False, models_dir=str(tmp_path))
    assert int(tr2.state.step) == steps_total

    # epoch-1 permutation differs from epoch-0's, so replaying epoch 0 after
    # resume would diverge; continuation must match the control exactly
    for pa, pb in zip(jax.tree.leaves(tr.state.params), jax.tree.leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    # mid-epoch leg: a max_steps-truncated checkpoint must skip the already
    # trained batches of the partial epoch on resume (not retrain them)
    spe = steps_total // 2
    assert spe >= 2
    mid = spe + 1  # one step into epoch 1
    tr3 = Pretrainer(mk())
    tr3.fit(ds, epochs=2, max_steps=mid, save_checkpoints=False,
            models_dir=str(tmp_path))
    assert int(tr3.state.step) == mid
    path2 = str(tmp_path / "ck_mid.msgpack")
    save_checkpoint(path2, tr3.state, config=tr3.config)

    tr4 = Pretrainer(mk())
    assert tr4.resume(path2) == mid
    tr4.fit(ds, epochs=2, save_checkpoints=False, models_dir=str(tmp_path))
    assert int(tr4.state.step) == steps_total
    for pa, pb in zip(jax.tree.leaves(tr.state.params), jax.tree.leaves(tr4.state.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_index_batcher_take():
    """take(steps) == the manual stage-then-slice idiom it replaced (same
    epoch advancement, partial tails past `steps` discarded)."""
    a = IndexBatcher(32, 8, shuffle=True, drop_last=True, seed=3)
    b = IndexBatcher(32, 8, shuffle=True, drop_last=True, seed=3)
    got = a.take(10)  # 4 batches/epoch -> spans 3 epochs
    chunks: list = []
    while len(chunks) < 10:
        chunks.extend(list(b))
    np.testing.assert_array_equal(got, np.stack(chunks[:10]))
    assert got.shape == (10, 8) and got.dtype == np.int32
    # successive takes keep advancing the shuffle (no replay)
    assert not np.array_equal(a.take(4), IndexBatcher(32, 8, seed=3).take(4))


def test_fit_written_checkpoint_resumes_scheduler_exactly(tmp_path):
    """Epoch checkpoints written by fit() itself must carry the POST-epoch
    scheduler state: under the cosine scheduler (one LR update per completed
    epoch) a resume from model_*_ep{N} that lagged one annealing step would
    diverge from the control forever (the pre-round-5 ordering saved before
    the scheduler update). Also pins the max_steps at_step fallback save."""
    import glob as g

    from maskedsst_tpu.train.checkpoint import load_metadata

    def mk():
        cfg = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
        cfg.n_bands = 40
        cfg.transformer_dim = 24
        cfg.transformer_depth = 2
        cfg.transformer_n_heads = 2
        cfg.transformer_mlp_dim = 16
        cfg.batch_size = 8
        cfg.steps_per_call = 2
        cfg.logging_freq = 1000
        cfg.skip_val = True
        cfg.scheduler = "cosine"
        cfg.model_save_freq = 1
        return cfg

    ds = SyntheticCubeDataset(num_tiles=32, n_bands=40, labeled=False)

    control = Pretrainer(mk())
    control.fit(ds, epochs=3, save_checkpoints=False, models_dir=str(tmp_path))

    interrupted = Pretrainer(mk())
    interrupted.fit(ds, epochs=2, save_checkpoints=True, models_dir=str(tmp_path / "i"))
    spe = int(interrupted.state.step) // 2  # fit() splits off its own val set
    (ep1,) = g.glob(str(tmp_path / "i" / "*" / "model_*_ep1.msgpack"))
    # post-epoch scheduler state in the sidecar: 2 completed cosine epochs
    assert load_metadata(ep1)["extra"]["scheduler"]["epoch"] == 2

    resumed = Pretrainer(mk())
    assert resumed.resume(ep1) == 2 * spe
    assert resumed.scheduler.epoch == 2
    resumed.fit(ds, epochs=3, save_checkpoints=False, models_dir=str(tmp_path))

    for pa, pb in zip(
        jax.tree.leaves(control.state.params), jax.tree.leaves(resumed.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for oa, ob in zip(
        jax.tree.leaves(control.state.opt_state), jax.tree.leaves(resumed.state.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))

    # max_steps break mid-epoch: the at_step fallback checkpoint appears
    # (truncated epochs no longer write a misleading ep{N} file)
    tr = Pretrainer(mk())
    tr.fit(ds, epochs=10, max_steps=spe + 1, save_checkpoints=True,
           models_dir=str(tmp_path / "m"))
    (at,) = g.glob(str(tmp_path / "m" / "*" / f"model_*_at_step{spe + 1}.msgpack"))
    assert not g.glob(str(tmp_path / "m" / "*" / "model_*_ep1.msgpack"))


def test_log_grad_norm_reaches_tracker(tmp_path):
    """cfg.log_grad_norm must actually surface grad_norm rows (the flag
    used to pay a per-step global_norm whose value no logging path ever
    consumed); it forces single-step dispatch so the metric exists."""
    from maskedsst_tpu.utils.tracking import Tracker

    class Capture(Tracker):
        def __init__(self):
            super().__init__("test", use_wandb=False, quiet=True)
            self.rows = []

        def log(self, scalars, step=None):
            self.rows.append((step, dict(scalars)))

    cfg = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    cfg.n_bands = 40
    cfg.transformer_dim = 24
    cfg.transformer_depth = 2
    cfg.transformer_n_heads = 2
    cfg.transformer_mlp_dim = 16
    cfg.batch_size = 8
    cfg.steps_per_call = 4
    cfg.logging_freq = 2
    cfg.skip_val = True
    cfg.log_grad_norm = True

    ds = SyntheticCubeDataset(num_tiles=32, n_bands=40, labeled=False)
    tr = Pretrainer(cfg)
    cap = Capture()
    tr.fit(ds, epochs=1, tracker=cap, save_checkpoints=False, models_dir=str(tmp_path))
    gn_rows = [m for _, m in cap.rows if "grad_norm" in m]
    assert gn_rows, cap.rows
    assert all(np.isfinite(m["grad_norm"]) and m["grad_norm"] > 0 for m in gn_rows)
