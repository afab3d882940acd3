"""Subprocess worker for the simulated multi-host test (test_multihost.py).

Joins a ``jax.distributed`` cluster of ``num_processes`` host processes, each
backed by ``devices_per_proc`` virtual CPU devices (Gloo CPU collectives), via
the production entry point ``maskedsst_tpu.parallel.initialize_multihost``
(SURVEY.md §5.8). Feeds this process's LOCAL shard of the global tile batch
through ``shard_host_batch`` and runs one real SimMIM pre-training step
(fwd+bwd+AdamW) on the global data-parallel mesh, then prints the replicated
loss for the parent test to compare across cluster topologies.

Run: python tests/multihost_worker.py <process_id> <num_processes> <port> \
         [fused] [mode] [workdir]
(with num_processes=1 this is the single-host control run on the same
4-device mesh and global batch; ``fused=1`` runs the production Pallas
kernel path — interpret mode on CPU — whose per-shard kernel calls are
shard_mapped over the multi-process data axis, dropout 0 because the
in-kernel PRNG has no CPU lowering).

Modes: ``step`` (default) runs one train step. ``steps2`` runs two —
the uninterrupted control for ``ckpt``, which runs one step, saves a
FULL-state checkpoint from the live multi-process cluster (the
process-0-gated path in train/checkpoint.py), rebuilds the trainer from
scratch, resumes, and runs the second step — save+resume must be
numerically invisible (VERDICT r2 weak #1).
"""

import os
import sys

DEVICES_PER_PROC = {1: 4, 2: 2, 4: 1}


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    fused = len(sys.argv) > 4 and sys.argv[4] == "1"
    mode = sys.argv[5] if len(sys.argv) > 5 else "step"
    workdir = sys.argv[6] if len(sys.argv) > 6 else "."
    n_local = DEVICES_PER_PROC[nproc]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import jax.numpy as jnp
    import numpy as np

    from maskedsst_tpu.config import get_pretrain_config
    from maskedsst_tpu.parallel.mesh import initialize_multihost, shard_host_batch
    from maskedsst_tpu.train.pretrainer import Pretrainer

    mesh = initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, (jax.process_count(), nproc)
    assert mesh.devices.size == 4, mesh.devices.shape

    config = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    # tiny shapes, same reductions as __graft_entry__.dryrun_multichip
    config.n_bands = 40
    config.transformer_dim = 24
    config.transformer_depth = 2
    config.transformer_n_heads = 2
    config.transformer_mlp_dim = 16
    config.batch_size = 8
    if fused:
        config.fused = True
        config.transformer_dropout = 0.0  # in-kernel PRNG has no CPU lowering
        config.transformer_emb_dropout = 0.0

    trainer = Pretrainer(config, mesh=mesh)
    # every process builds the same GLOBAL batch deterministically, then
    # contributes only its local rows — the multi-host input contract
    tiles = (
        np.random.default_rng(0)
        .standard_normal((config.batch_size, config.n_bands, 64, 64))
        .astype(np.float32)
    )
    rows_here = config.batch_size // nproc
    local = tiles[pid * rows_here : (pid + 1) * rows_here]
    batch = shard_host_batch(mesh, jnp.asarray(local))
    assert batch.shape[0] == config.batch_size, batch.shape

    state, metrics = trainer._train_step(trainer.state, batch)

    if mode == "steps2":
        state, metrics = trainer._train_step(state, batch)
    elif mode == "ckpt":
        from jax.experimental import multihost_utils

        from maskedsst_tpu.train.checkpoint import save_checkpoint

        path = os.path.join(workdir, "mid.msgpack")
        trainer.state = state
        # every process calls save (host materialization may collective);
        # only process 0 may write — asserted per rank below
        save_checkpoint(path, trainer.state, config, extra={"epoch": 0})
        if pid != 0:
            probe = os.path.join(workdir, f"rank{pid}_probe.msgpack")
            save_checkpoint(probe, trainer.state)
            assert not os.path.exists(probe), "non-primary process wrote a checkpoint"
        # Tracker persistence is rank-gated on the REAL cluster too (the
        # unit test monkeypatches _process_index; this exercises the live
        # jax.process_index path): non-primary ranks must not write their
        # JSONL and carry an explicit placeholder run_id
        from maskedsst_tpu.utils.tracking import Tracker

        jsonl = os.path.join(workdir, f"rank{pid}.jsonl")
        tr = Tracker("mh-test", config, use_wandb=False, jsonl_path=jsonl)
        tr.log({"probe": 1.0}, step=0)
        if pid != 0:
            assert not os.path.exists(jsonl), "non-primary process wrote tracking JSONL"
            assert tr.run_id == f"nonprimary-{pid}", tr.run_id
        else:
            assert os.path.exists(jsonl)
        if nproc > 1:
            multihost_utils.sync_global_devices("checkpoint written")
        assert os.path.exists(path) and os.path.exists(path + ".json")
        assert not [f for f in os.listdir(workdir) if ".tmp" in f], os.listdir(workdir)
        # cold resume: a brand-new trainer (fresh init, fresh optimizer)
        # restored from the file must continue bit-exactly
        trainer2 = Pretrainer(config, mesh=mesh)
        resumed_step = trainer2.resume(path)
        assert resumed_step == 1, resumed_step
        state, metrics = trainer2._train_step(trainer2.state, batch)

    loss = float(metrics["loss"])
    # param update must be identical (replicated) everywhere — spot-check a leaf
    leaf = np.asarray(
        jax.tree.leaves(state.params)[0], dtype=np.float64
    )
    print(f"RESULT pid={pid} loss={loss:.10f} leafsum={float(leaf.sum()):.10f}", flush=True)


if __name__ == "__main__":
    main()
