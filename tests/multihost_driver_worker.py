"""Subprocess worker running the ACTUAL pretrain.py driver under a simulated
multi-host cluster (VERDICT r3 #4).

tests/multihost_worker.py pins the train-STEP seam (initialize_multihost +
shard_host_batch + one _train_step); this worker goes the rest of the way:
``pretrain.main()`` itself — config load, synthetic dataset, DeviceTileStore
population on the global mesh, the superstep scan inside ``fit()``,
validation, rank-gated checkpointing and run-dir creation — executes on every
rank of a 2-process Gloo cluster via the driver's own ``--multihost
--coordinator ... --num-processes ... --process-id ...`` flags. The parent
test compares the FINAL train loss across ranks and against a single-process
control, and asserts only rank 0 touched the filesystem.

Run: python tests/multihost_driver_worker.py <pid> <nproc> <port> <workdir> [driver]
(driver: "pretrain" (default), "finetune", or "finetune-streamed" — the
finetune leg drives finetune.main() through the same cluster: Finetuner
store path, superstep scan, windowed validation, best-checkpoint saving;
the streamed leg sets ``device_data: false`` so fit() takes the
host-streaming fallback instead, covering Finetuner._global_batch — the
path every stochastic dataset (houston2018 random-patch mode) and every
store MemoryError fallback rides.)
"""

import os
import sys

DEVICES_PER_PROC = {1: 4, 2: 2, 4: 1}


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    workdir = sys.argv[4]
    driver = sys.argv[5] if len(sys.argv) > 5 else "pretrain"
    n_local = DEVICES_PER_PROC[nproc]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import yaml

    # tiny-model copies of the SHIPPED configs: the driver must run its real
    # config-merge path, so overrides go through files, not monkeypatching
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tiny = dict(
        n_bands=40,
        transformer_dim=24,
        transformer_depth=2,
        transformer_n_heads=2,
        transformer_mlp_dim=16,
        batch_size=8,
        steps_per_call=2,  # exercise the superstep scan across processes
        logging_freq=2,
    )
    with open(os.path.join(repo, "configs", "config.yaml")) as f:
        base = yaml.safe_load(f)
    base_path = os.path.join(workdir, f"config_{pid}.yaml")
    with open(base_path, "w") as f:
        yaml.safe_dump(base, f)

    models_dir = os.path.join(workdir, "models")
    mh_argv = [
        "--multihost",
        "--coordinator", f"127.0.0.1:{port}",
        "--num-processes", str(nproc),
        "--process-id", str(pid),
    ] if nproc > 1 else []
    sys.path.insert(0, repo)

    if driver == "pretrain":
        with open(os.path.join(repo, "configs", "pretrain_config.yaml")) as f:
            pre = yaml.safe_load(f)
        pre.update(tiny, model_save_freq=1)
        pre_path = os.path.join(workdir, f"pretrain_config_{pid}.yaml")
        with open(pre_path, "w") as f:
            yaml.safe_dump(pre, f)
        argv = [
            "pretrain.py",
            "--pretrain-config", pre_path,
            "--config", base_path,
            "--synthetic", "--synthetic-tiles", "40",
            "--epochs", "1", "--steps", "6",
            "--models-dir", models_dir,
            "--cpu",
            # fp32: bit-exact loss comparison across cluster topologies (the
            # bf16 default rounds identically too, but fp32 removes any doubt)
            "--fp32",
        ]
        import pretrain as mod
    else:
        # finetune.main() resolves configs/finetune_config_<dataset>.yaml
        # relative to the cwd — give it a workdir configs/ with the tiny copy
        # (per-rank cwds would diverge the compile cache; share one configs/
        # dir, write rank-0-style once per rank with identical content)
        with open(os.path.join(repo, "configs", "finetune_config_enmap.yaml")) as f:
            fin = yaml.safe_load(f)
        fin.update(tiny)
        if driver == "finetune-streamed":
            # force the host-streaming fallback (no DeviceTileStore): every
            # batch goes through Finetuner._global_batch / the streamed
            # windowed eval; a small eval_chunk keeps the padded windows tiny
            fin.update(device_data=False, eval_chunk=8)
        cfg_dir = os.path.join(workdir, f"rank{pid}", "configs")
        os.makedirs(cfg_dir, exist_ok=True)
        with open(os.path.join(cfg_dir, "finetune_config_enmap.yaml"), "w") as f:
            yaml.safe_dump(fin, f)
        os.chdir(os.path.join(workdir, f"rank{pid}"))
        argv = [
            "finetune.py", "enmap",
            "--config", base_path,
            "--synthetic", "--synthetic-tiles", "48",
            "--checkpoint", "none",
            "--epochs", "2", "--steps", "6",
            "--models-dir", models_dir,
            "--cpu", "--fp32",
        ]
        import finetune as mod

    argv += mh_argv
    old_argv = sys.argv
    sys.argv = argv
    try:
        mod.main()  # prints "FINAL train_loss=..." on success
    finally:
        sys.argv = old_argv

    if nproc > 1:
        assert jax.process_count() == nproc, (jax.process_count(), nproc)
    # rank-gated persistence: only process 0 creates run dirs / checkpoints
    entries = sorted(os.listdir(models_dir)) if os.path.isdir(models_dir) else []
    print(f"MODELS pid={pid} entries={entries}", flush=True)
    if pid == 0:
        assert entries, "process 0 saved no checkpoints"
        run_dir = os.path.join(models_dir, entries[0])
        assert any(f.endswith(".msgpack") for f in os.listdir(run_dir)), (
            os.listdir(run_dir)
        )
    assert not [e for e in entries if e.startswith("nonprimary")], entries


if __name__ == "__main__":
    main()
