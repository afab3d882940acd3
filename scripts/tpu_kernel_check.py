#!/usr/bin/env python
"""On-TPU validation + timing of the fused Pallas transformer layer.

Run from the repo root on a machine with a real TPU attached (the CPU test
suite covers the same math in interpret mode, but dropout and the Mosaic
lowering itself only exercise on hardware):

    python scripts/tpu_kernel_check.py

Checks, per factorized shape ([1280, 64, 96] spatial / [4096, 20, 96]
spectral):
  * forward + gradient parity vs a plain-XLA expression of the layer
    (bf16 matmul tolerance; gradient relative error ~1e-6 expected);
  * dropout determinism (same seed → bit-identical output and grads;
    train output differs from eval);
  * fwd and fwd+bwd per-layer timing via chained lax.scan supersteps
    (see CLAUDE.md "Timing methodology": block_until_ready is unreliable
    on tunneled backends — force a host fetch, use medians).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from maskedsst_tpu.ops.fused_layer import LayerParams, fused_transformer_layer

D, H, DH, MLP = 96, 8, 64, 64
INNER = H * DH


def make_params(rng):
    def mk(*s, scale=0.05):
        return jnp.asarray(rng.standard_normal(s) * scale, jnp.float32)

    return LayerParams(
        ln1_scale=jnp.ones((D,)), ln1_bias=jnp.zeros((D,)),
        wqkv=mk(D, 3 * INNER), wout=mk(INNER, D), bout=jnp.zeros((D,)),
        ln2_scale=jnp.ones((D,)), ln2_bias=jnp.zeros((D,)),
        w1=mk(D, MLP), b1=jnp.zeros((MLP,)), w2=mk(MLP, D), b2=jnp.zeros((D,)),
    )


def xla_layer(x, p):
    """Plain-XLA oracle of the identical layer math (no dropout)."""
    def ln(x, s, b):
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        return (x - m) / jnp.sqrt(v + 1e-5) * s + b

    h = ln(x, p.ln1_scale, p.ln1_bias)
    q, k, v = jnp.split(h @ p.wqkv, 3, -1)
    B, S, _ = x.shape

    def heads(t):
        return t.reshape(B, S, H, DH).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    a = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) * (DH ** -0.5), -1)
    o = (a @ v).transpose(0, 2, 1, 3).reshape(B, S, INNER)
    x = x + o @ p.wout + p.bout
    h2 = ln(x, p.ln2_scale, p.ln2_bias)
    g = jax.nn.gelu(h2 @ p.w1 + p.b1, approximate=False)
    return x + g @ p.w2 + p.b2


def median_chain_ms(fn, x, n, reps=5):
    cf = jax.jit(lambda x: jax.lax.scan(lambda c, _: (fn(c), None), x, None, length=n)[0])
    float(cf(x)[0, 0, 0])  # compile + sync via host fetch
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(cf(x)[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1000 / n


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    params = make_params(rng)
    for (B, S) in [(1280, 64), (4096, 20)]:
        x = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        fused = lambda c: fused_transformer_layer(c, params, 7, H, DH)
        yf = jax.jit(fused)(x)
        yx = jax.jit(xla_layer)(x, params)
        ferr = float(jnp.max(jnp.abs(yf - yx)))

        loss_f = lambda c: jnp.sum(jnp.sin(fused(c)))
        loss_x = lambda c: jnp.sum(jnp.sin(xla_layer(c, params)))
        gf, gx = jax.jit(jax.grad(loss_f))(x), jax.jit(jax.grad(loss_x))(x)
        gerr = float(jnp.max(jnp.abs(gf - gx)))
        gref = float(jnp.max(jnp.abs(gx)))
        print(f"({B},{S}): fwd maxerr {ferr:.2e}  dx maxerr {gerr:.2e} (rel {gerr/max(gref,1e-9):.2e})")
        assert ferr < 5e-3 and gerr / max(gref, 1e-9) < 1e-2

        f_tr = jax.jit(lambda c: fused_transformer_layer(c, params, 11, H, DH, jnp.bfloat16, 0.1, True))
        y1, y2 = f_tr(x), f_tr(x)
        det = bool(jnp.all(y1 == y2))
        diff = bool(jnp.any(y1 != yf))
        print(f"  dropout deterministic: {det}  differs from eval: {diff}")
        assert det and diff

        t_fwd = median_chain_ms(fused, x, n=50)

        def train_step(c):
            g = jax.grad(lambda xx: jnp.sum(jnp.sin(fused_transformer_layer(
                xx, params, 7, H, DH, jnp.bfloat16, 0.1, True))))(c)
            return c + 1e-6 * g

        t_fb = median_chain_ms(train_step, x, n=30)
        print(f"  fwd {t_fwd:.3f} ms/layer   fwd+bwd {t_fb:.3f} ms/layer")
    print("ok")


if __name__ == "__main__":
    main()
