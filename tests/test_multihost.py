"""Simulated multi-host data parallelism: real processes, real collectives.

The reference is strictly single-device (SURVEY.md §2.3); the TPU rebuild's
multi-host story is ``initialize_multihost`` + ``shard_host_batch``
(maskedsst_tpu/parallel/mesh.py, SURVEY.md §5.8). The multichip dryrun and the
8-virtual-device suite exercise multi-DEVICE sharding inside one process; this
test goes one level further and validates the multi-PROCESS path end to end:
two OS processes, each owning 2 virtual CPU devices, join a
``jax.distributed`` cluster over Gloo CPU collectives, stitch their local
batch shards into one global array, and run the real SimMIM train step on the
global 4-device mesh. The replicated loss and updated params must agree
across ranks and match a single-process control run on the identical global
batch and mesh size — i.e. multi-host is numerically invisible, exactly the
property a v5e pod slice relies on.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")
_RESULT = re.compile(r"RESULT pid=(\d+) loss=([-\d.]+) leafsum=([-\d.]+)")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _launch(
    pid: int,
    nproc: int,
    port: int,
    fused: bool = False,
    mode: str = "step",
    workdir: str = ".",
) -> subprocess.Popen:
    return subprocess.Popen(
        [
            sys.executable, WORKER, str(pid), str(nproc), str(port),
            str(int(fused)), mode, workdir,
        ],
        cwd=REPO,
        env=_clean_env(),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def _results(procs) -> dict:
    out = {}
    logs = []
    for p in procs:
        try:
            # generous: workers compile Pallas kernels on CPU and the suite
            # may share the host with other jobs (a 420 s limit flaked once
            # under a concurrent full-suite + TPU-bench load)
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out (Gloo rendezvous hang?)")
        logs.append(stdout)
        if p.returncode != 0:
            pytest.fail(f"worker rc={p.returncode}\n{stdout[-3000:]}")
        m = _RESULT.search(stdout)
        assert m, f"no RESULT line in worker output:\n{stdout[-3000:]}"
        out[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return out


def test_two_process_cluster_matches_single_process():
    port = _free_port()
    procs = [_launch(0, 2, port), _launch(1, 2, port)]
    multi = _results(procs)
    single = _results([_launch(0, 1, _free_port())])

    # both ranks see the same replicated loss and identical updated params
    assert multi[0] == pytest.approx(multi[1], rel=0, abs=0.0)
    # and the 2-process cluster reproduces the single-process 4-device step
    np.testing.assert_allclose(multi[0][0], single[0][0], rtol=1e-6)
    np.testing.assert_allclose(multi[0][1], single[0][1], rtol=1e-6)


def test_two_process_checkpoint_save_resume(tmp_path):
    """Persistence on a live multi-process cluster (VERDICT r2 weak #1):
    both ranks call save_checkpoint mid-run, only process 0 writes (the
    worker asserts a rank-1 save produces no file and no stray .tmp
    remains), every rank cold-resumes a fresh trainer from the file, and
    the second step must reproduce the uninterrupted 2-step control
    bit-exactly on both ranks."""
    port = _free_port()
    wd = str(tmp_path)
    procs = [
        _launch(0, 2, port, mode="ckpt", workdir=wd),
        _launch(1, 2, port, mode="ckpt", workdir=wd),
    ]
    resumed = _results(procs)
    control = _results(
        [_launch(0, 2, (p := _free_port()), mode="steps2"),
         _launch(1, 2, p, mode="steps2")]
    )

    assert resumed[0] == pytest.approx(resumed[1], rel=0, abs=0.0)
    assert resumed[0] == pytest.approx(control[0], rel=0, abs=0.0)
    assert control[0] == pytest.approx(control[1], rel=0, abs=0.0)


DRIVER_WORKER = os.path.join(REPO, "tests", "multihost_driver_worker.py")
_FINAL = re.compile(r"FINAL train_loss=([-\d.]+)")


def _launch_driver(
    pid: int, nproc: int, port: int, workdir: str, driver: str = "pretrain"
) -> subprocess.Popen:
    return subprocess.Popen(
        [
            sys.executable, DRIVER_WORKER, str(pid), str(nproc), str(port),
            workdir, driver,
        ],
        cwd=REPO,
        env=_clean_env(),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def _final_losses(procs) -> list:
    losses = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost driver worker timed out")
        if p.returncode != 0:
            pytest.fail(f"driver worker rc={p.returncode}\n{stdout[-4000:]}")
        m = _FINAL.search(stdout)
        assert m, f"no FINAL line in driver output:\n{stdout[-4000:]}"
        losses.append(float(m.group(1)))
    return losses


def test_driver_fit_under_two_process_cluster(tmp_path):
    """pretrain.py's OWN main() — config merge, synthetic dataset,
    DeviceTileStore population on the global mesh, the superstep scan,
    validation, rank-gated checkpointing — runs on a live 2-process Gloo
    cluster through the driver's --multihost flags (VERDICT r3 #4: the
    advertised multi-host capability must have a driver entry point, and
    fit() itself must run multi-process, not just the train-step seam).
    The final train loss must agree across ranks (replicated state) and
    match a single-process run of the identical driver invocation; the
    worker itself asserts only rank 0 wrote checkpoints."""
    port = _free_port()
    wd_multi, wd_single = tmp_path / "multi", tmp_path / "single"
    wd_multi.mkdir(), wd_single.mkdir()
    procs = [
        _launch_driver(0, 2, port, str(wd_multi)),
        _launch_driver(1, 2, port, str(wd_multi)),
    ]
    multi = _final_losses(procs)
    single = _final_losses([_launch_driver(0, 1, _free_port(), str(wd_single))])

    assert multi[0] == pytest.approx(multi[1], rel=0, abs=0.0)
    np.testing.assert_allclose(multi[0], single[0], rtol=1e-6)
    # rank 0 of the cluster saved the epoch checkpoint; no nonprimary dirs
    runs = list((wd_multi / "models").iterdir())
    assert runs and not [r for r in runs if r.name.startswith("nonprimary")]


def test_finetune_driver_fit_under_two_process_cluster(tmp_path):
    """finetune.py's main() on the same 2-process Gloo cluster: the
    Finetuner's store path (supersteps, windowed validation, best-acc
    checkpointing) must produce rank-identical losses matching the
    single-process control — the downstream half of VERDICT r3 #4."""
    port = _free_port()
    wd_multi, wd_single = tmp_path / "multi", tmp_path / "single"
    wd_multi.mkdir(), wd_single.mkdir()
    procs = [
        _launch_driver(0, 2, port, str(wd_multi), driver="finetune"),
        _launch_driver(1, 2, port, str(wd_multi), driver="finetune"),
    ]
    multi = _final_losses(procs)
    single = _final_losses(
        [_launch_driver(0, 1, _free_port(), str(wd_single), driver="finetune")]
    )
    assert multi[0] == pytest.approx(multi[1], rel=0, abs=0.0)
    np.testing.assert_allclose(multi[0], single[0], rtol=1e-6)


def test_finetune_streamed_driver_under_two_process_cluster(tmp_path):
    """The HOST-STREAMING finetune path (device_data: false — what every
    stochastic dataset like houston2018 random-patch mode and every store
    MemoryError fallback rides) on the 2-process Gloo cluster: streamed
    train batches and windowed-eval chunks must be assembled into GLOBAL
    arrays (Finetuner._global_batch), not locally committed — and the
    result must match the single-process control exactly."""
    port = _free_port()
    wd_multi, wd_single = tmp_path / "multi", tmp_path / "single"
    wd_multi.mkdir(), wd_single.mkdir()
    procs = [
        _launch_driver(0, 2, port, str(wd_multi), driver="finetune-streamed"),
        _launch_driver(1, 2, port, str(wd_multi), driver="finetune-streamed"),
    ]
    multi = _final_losses(procs)
    single = _final_losses(
        [_launch_driver(0, 1, _free_port(), str(wd_single), driver="finetune-streamed")]
    )
    assert multi[0] == pytest.approx(multi[1], rel=0, abs=0.0)
    np.testing.assert_allclose(multi[0], single[0], rtol=1e-6)


def test_two_process_cluster_fused_kernels():
    """Production path across processes: the Pallas kernel calls (interpret
    mode on CPU) run under shard_map over a data axis that SPANS two
    processes, with the gradient psum riding Gloo. Replicated loss/params
    must agree across ranks and match the single-process fused control."""
    port = _free_port()
    procs = [_launch(0, 2, port, fused=True), _launch(1, 2, port, fused=True)]
    multi = _results(procs)
    single = _results([_launch(0, 1, _free_port(), fused=True)])

    assert multi[0] == pytest.approx(multi[1], rel=0, abs=0.0)
    np.testing.assert_allclose(multi[0][0], single[0][0], rtol=1e-6)
    np.testing.assert_allclose(multi[0][1], single[0][1], rtol=1e-6)
