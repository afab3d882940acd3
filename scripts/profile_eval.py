#!/usr/bin/env python
"""Per-op device profile of the serving (eval) forward.

Same methodology as profile_step.py but for the deterministic classifier
forward that scripts/serving_bench.py measures: a lax.scan chain of fused
bf16 forwards at a given batch size. Prints device-side op durations by
HLO category / op name, normalized per forward.

Usage: python scripts/profile_eval.py [--batch 512] [--chain 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_step import parse_trace  # noqa: E402


def run_chain(batch: int, chain: int, logdir: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskedsst_tpu.config import get_pretrain_config
    from maskedsst_tpu.models import ViTSpatialSpectral
    from maskedsst_tpu.utils.compile_cache import enable_persistent_cache
    from maskedsst_tpu.utils.profiling import trace

    enable_persistent_cache()
    config = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    model = ViTSpatialSpectral(
        image_size=config.image_size,
        spatial_patch_size=config.patch_size,
        spectral_patch_size=config.band_patch_size,
        num_classes=20,
        dim=config.transformer_dim,
        depth=config.transformer_depth,
        heads=config.transformer_n_heads,
        mlp_dim=config.transformer_mlp_dim,
        channels=config.n_bands,
        spectral_pos=list(range(config.n_bands // config.band_patch_size)),
        fused=True,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, config.n_bands, 8, 8)), jnp.bfloat16)
    variables = jax.jit(lambda k, v: model.init(k, v, deterministic=True))(
        jax.random.PRNGKey(0), x
    )

    @jax.jit
    def serve(x):
        def body(x, _):
            logits = model.apply(variables, x, deterministic=True)
            return x + 1e-6 * jnp.mean(logits).astype(x.dtype), ()

        x, _ = jax.lax.scan(body, x, None, length=chain - 1)
        return model.apply(variables, x, deterministic=True)

    out = serve(x)
    _ = np.asarray(out)[:1, :1]  # compile + warm

    with trace(logdir, timeout_s=30.0) as info:
        out = serve(x)
        _ = np.asarray(out)[:1, :1]
    print(f"traced={info['traced']} wall={info['wall_s'] * 1e3:.1f} ms", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--logdir", default="/tmp/maskedsst_profile_eval")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        run_chain(args.batch, args.chain, args.logdir)
    parse_trace(args.logdir, args.chain)


if __name__ == "__main__":
    main()
