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


def run_chain(batch: int, chain: int, logdir: str) -> bool:
    import shutil

    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskedsst_tpu.utils.compile_cache import enable_persistent_cache
    from maskedsst_tpu.utils.profiling import trace
    from serving_bench import build_serving_model, make_serve

    enable_persistent_cache()
    # stale-trace guard (same as profile_step): a failed trace must not let
    # parse_trace silently report a PREVIOUS run's numbers
    shutil.rmtree(logdir, ignore_errors=True)
    # the EXACT serving_bench workload (shared construction — this profiler
    # exists to explain that bench's numbers)
    model, config = build_serving_model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, config.n_bands, 8, 8)), jnp.bfloat16)
    variables = jax.jit(lambda k, v: model.init(k, v, deterministic=True))(
        jax.random.PRNGKey(0), x
    )
    serve = make_serve(model, variables, chain)

    out = serve(x)
    _ = np.asarray(out)[:1, :1]  # compile + warm

    with trace(logdir, timeout_s=30.0) as info:
        out = serve(x)
        _ = np.asarray(out)[:1, :1]
    print(f"traced={info['traced']} wall={info['wall_s'] * 1e3:.1f} ms", file=sys.stderr)
    return bool(info["traced"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--logdir", default="/tmp/maskedsst_profile_eval")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        if not run_chain(args.batch, args.chain, args.logdir):
            print("trace failed; not parsing (retry — tunnel may be congested)",
                  file=sys.stderr)
            sys.exit(1)
    parse_trace(args.logdir, args.chain)


if __name__ == "__main__":
    main()
