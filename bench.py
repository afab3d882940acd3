#!/usr/bin/env python
"""Benchmark: SimMIM pre-training throughput at the reference recipe.

Measures cubes/sec/chip for the full reference workload (pretrain_config.yaml:
batch 64 of 8x8x200-band cubes from 64x64 tiles, mask ratio 0.70 tube
masking, dropout 0.1, AdamW 8e-3 with elementwise grad clamp, bf16 compute)
through the production path: HBM-resident tile store, on-device random crop +
mask sampling, fused Pallas transformer layers, and supersteps of 8 scanned
train steps per dispatch.

Prints ONE JSON line:
  {"metric": "pretrain_cubes_per_sec_per_chip", "value": N, "unit":
   "cubes/s/chip", "vs_baseline": R}

vs_baseline compares against the reference's PyTorch-GPU recipe. The
reference publishes no throughput numbers (BASELINE.json "published": {}),
so the anchor is a MEASURED upper bound on what the reference can do: its
eager fp32 step materializes 35.30 GB of intermediates (measured on the
reference's own modules with a dispatch-mode byte counter,
scripts/reference_step_bytes.py; linear in batch to <1%), each byte written
once and read at least once => >=70.6 GB HBM traffic/step; on the best GPU
its software envelope (torch 1.12) supports — A100-SXM at its full 2.04
TB/s peak, crediting zero launch gaps, zero host-side numpy mask
generation (measured 1.9 ms/step), zero python dispatch — the step takes
>=34.6 ms => <=1,849 cubes/s. Full derivation in BASELINE.md.
"""

import json
import os
import sys

BASELINE_CUBES_PER_SEC = 1849.0

# The image carries two pythons: /opt/venv/bin/python (jax + numpy) and a
# bare /usr/local/bin/python with no scientific stack. If we were launched
# with the bare one, re-exec under the venv interpreter rather than dying
# on the first import.
if __name__ == "__main__":
    try:
        import numpy  # noqa: F401

        # the venv leg: clear the loop guard so child processes (device
        # probe, a driver re-running bench) never inherit a stale one that
        # would disable THEIR re-exec fallback
        os.environ.pop("MASKEDSST_REEXEC", None)
    except ImportError:
        # NB: /opt/venv/bin/python symlinks the same binary — the venv works
        # through sys.prefix/site-packages, so compare prefixes, not paths.
        # The sys.prefix check alone breaks the exec loop (the re-exec'd
        # child's prefix IS /opt/venv); MASKEDSST_REEXEC is belt-and-braces
        # for a venv so broken its prefix doesn't resolve, and is scoped to
        # one exec hop by the pop above.
        _venv = "/opt/venv/bin/python"
        if (os.path.exists(_venv) and sys.prefix != "/opt/venv"
                and not os.environ.get("MASKEDSST_REEXEC")):
            os.environ["MASKEDSST_REEXEC"] = "1"
            os.execv(_venv, [_venv, os.path.abspath(__file__)] + sys.argv[1:])
        raise

import time


def _probe_device(timeout_s: float) -> None:
    """Fail LOUDLY (one JSON error line + exit 1) when the device doesn't
    answer a trivial op within ``timeout_s`` — the axon tunnel has gone
    fully dead for hours at a time (CLAUDE.md), and a silently hung bench
    wedges whatever driver invoked it."""
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
        "print(float((x @ x).sum()))"
    )
    try:
        subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, check=True,
        )
        return
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        print(json.dumps({
            "metric": "pretrain_cubes_per_sec_per_chip",
            "value": 0.0,
            "unit": "cubes/s/chip",
            "vs_baseline": 0.0,
            "error": f"device unreachable: trivial matmul did not complete "
                     f"in {timeout_s:.0f}s (tunnel outage?)",
        }))
        raise SystemExit(1)


def main() -> None:
    _probe_device(float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "900")))

    import jax.numpy as jnp

    from maskedsst_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from maskedsst_tpu.config import get_pretrain_config
    from maskedsst_tpu.data.device_store import DeviceTileStore, IndexBatcher
    from maskedsst_tpu.data.synthetic import SyntheticCubeDataset
    from maskedsst_tpu.train.pretrainer import Pretrainer

    config = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    # steps per dispatch amortize the fixed ~27 ms host<->device round trip
    # (semantics-neutral: the superstep is a scanned chain of identical
    # train steps); 256 leaves ~0.1 ms/step of tunnel overhead
    config.steps_per_call = int(os.environ.get("BENCH_STEPS_PER_CALL", "256"))
    trainer = Pretrainer(config, dtype=jnp.bfloat16)
    n_chips = trainer.mesh.devices.size
    batch = config.batch_size
    k = trainer.steps_per_call

    dataset = SyntheticCubeDataset(num_tiles=128, n_bands=config.n_bands, labeled=False)
    store = DeviceTileStore(dataset, trainer.mesh)
    batcher = IndexBatcher(len(store), batch, shuffle=True, drop_last=True, seed=0)

    def chunks():
        # take() advances the per-epoch shuffle internally; the trailing
        # partial epoch of each call is DISCARDED (successive chunks sample
        # freshly shuffled epochs rather than carrying a remainder). That is
        # intended here: the bench needs a steady stream of full batches,
        # not exact epoch accounting — training loops use the loader
        # epoch-wise and never hit this seam.
        while True:
            yield jnp.asarray(batcher.take(k))

    gen = chunks()
    state = trainer.state
    # 8 timed supersteps: the shared chip's load varies on a seconds scale,
    # and the median of 8 x ~8.6 s windows is robust to one congested patch
    supersteps = int(os.environ.get("BENCH_SUPERSTEPS", "8"))
    # pre-stage index chunks on device: mid-loop host->device uploads
    # serialize against the compute queue on tunneled backends
    staged = [next(gen) for _ in range(supersteps + 1)]

    # warmup / compile; completion forced by a host fetch because
    # block_until_ready does not reliably block on tunneled TPU backends
    state, losses = trainer._train_superstep(state, store.arrays["img"], staged[0])
    _ = float(losses[-1])

    # per-superstep timing with a sync each (median is robust to the host's
    # 2x run-to-run throughput variance observed on shared/tunneled TPUs)
    times = []
    for i in range(supersteps):
        t0 = time.perf_counter()
        state, losses = trainer._train_superstep(state, store.arrays["img"], staged[i + 1])
        _ = float(losses[-1])  # sync: the state chain forces every step to run
        times.append(time.perf_counter() - t0)
    import statistics

    dt = statistics.median(times)
    cubes_per_sec = k * batch / dt
    per_chip = cubes_per_sec / n_chips

    # device-step attribution (one traced superstep): lets future rounds
    # split a throughput delta into kernel time vs tunnel/host overhead
    # without re-deriving it from scripts/profile_step.py
    out = {
        "metric": "pretrain_cubes_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "cubes/s/chip",
        "vs_baseline": round(per_chip / BASELINE_CUBES_PER_SEC, 3),
    }
    device_ms = _device_ms_per_step(trainer, state, store, staged[0], k)
    if device_ms is not None:
        tflops = _useful_flops_per_step(config) / (device_ms * 1e-3) / 1e12
        out["device_ms_per_step"] = round(device_ms, 3)
        # MFU vs v5e bf16 peak (197 TFLOPS), and vs the MXU-FILL bound at
        # the reference tile shapes (FLOP-weighted attainable fill 0.408 —
        # spatial 44.1% x 0.545 FLOP share + spectral 36.8% x 0.455;
        # BASELINE.md roofline appendix). mxu_fill_frac ≈ 0.4-0.5 is the
        # known-good operating point; a drop with flat cubes/s means the
        # kernels regressed while host/tunnel slack absorbed it.
        out["model_tflops"] = round(tflops, 1)
        out["mfu"] = round(tflops / 197.0, 4)
        out["mxu_fill_frac"] = round(tflops / 197.0 / 0.408, 4)
    print(json.dumps(out))


def _useful_flops_per_step(config) -> float:
    """Analytic USEFUL matmul FLOPs of one train step: transformer-layer
    matmuls only (blockwise embed/decode are <2% of device time), counting
    fwd + 2x for backward (dgrad+wgrad) and EXCLUDING the backward's
    in-kernel activation recompute — the conventional MFU numerator.
    Derivation mirrors the BASELINE.md roofline appendix inventory."""
    d = config.transformer_dim                      # 96
    heads, dh = config.transformer_n_heads, 64      # dim_head default
    inner = heads * dh                              # 512
    ff = config.transformer_mlp_dim                 # 64
    n_blocks = config.n_bands // config.band_patch_size
    n_spatial = config.image_size ** 2
    tokens = config.batch_size * n_blocks * n_spatial

    def per_token(seq):
        # qkv [D->3I] + attention (QK^T and AV, block-diagonal useful part)
        # + proj [I->D] + ff [D->F->D]
        return 8 * d * inner + 4 * seq * inner + 4 * d * ff

    fwd = tokens * config.transformer_depth * (
        per_token(n_spatial) + per_token(n_blocks)
    )
    return 3.0 * fwd


def _device_ms_per_step(trainer, state, store, idx, steps: int) -> "float | None":
    """Device-busy ms per train step from one traced superstep (shared
    accounting + guards: utils.profiling.traced_busy_ms). None when tracing
    fails — the throughput metric must never die on a profiler hiccup."""
    from maskedsst_tpu.utils.profiling import traced_busy_ms

    def one_superstep():
        _, losses = trainer._train_superstep(state, store.arrays["img"], idx)
        _ = float(losses[-1])

    try:
        busy = traced_busy_ms("/tmp/maskedsst_bench_trace", one_superstep)
        return None if busy is None else busy / steps
    except Exception as exc:  # noqa: BLE001 — best-effort attribution
        print(f"device trace failed: {exc!r}", file=sys.stderr)
        return None


if __name__ == "__main__":
    main()
