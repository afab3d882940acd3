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
from maskedsst_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

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
    # (4096, 5) = the Houston2018 spectral geometry (50 bands -> 5 blocks),
    # run with bf16 activations as production does: regression-pins the
    # odd-seq slab routing (fused_layer._odd_packed_slab — default the
    # ODD_SEQ_PAD masked-pad route, plus the fp32-I/O control) on real
    # Mosaic lowering, which CPU interpret cannot check
    for (B, S, dt) in [(1280, 64, jnp.float32), (4096, 20, jnp.float32),
                       (4096, 5, jnp.bfloat16)]:
        x = jnp.asarray(rng.standard_normal((B, S, D)), dt)
        fused = lambda c: fused_transformer_layer(c, params, 7, H, DH)
        yf = jax.jit(fused)(x)
        yx = jax.jit(xla_layer)(x, params)
        ferr = float(jnp.max(jnp.abs(yf - yx)))
        if dt == jnp.bfloat16 and S % 2 == 1:
            # the A/B control route must stay green on-chip too (kernel_tune
            # --odd-seq-fp32 relies on it)
            import maskedsst_tpu.ops.fused_layer as _fl

            orig_pad = _fl.ODD_SEQ_PAD
            try:
                _fl.ODD_SEQ_PAD = False
                yc = jax.jit(fused)(x)
            finally:
                _fl.ODD_SEQ_PAD = orig_pad
            cerr = float(jnp.max(jnp.abs(yc - yx)))
            print(f"({B},{S}): odd-seq fp32 control route maxerr {cerr:.2e}")
            assert cerr < 5e-2

        loss_f = lambda c: jnp.sum(jnp.sin(fused(c)))
        loss_x = lambda c: jnp.sum(jnp.sin(xla_layer(c, params)))
        gf, gx = jax.jit(jax.grad(loss_f))(x), jax.jit(jax.grad(loss_x))(x)
        gerr = float(jnp.max(jnp.abs(gf - gx)))
        gref = float(jnp.max(jnp.abs(gx)))
        print(f"({B},{S}): fwd maxerr {ferr:.2e}  dx maxerr {gerr:.2e} (rel {gerr/max(gref,1e-9):.2e})")
        # bf16 activations round both sides to ~2^-8 relative resolution
        tol = (5e-3, 1e-2) if dt == jnp.float32 else (5e-2, 5e-2)
        assert ferr < tol[0] and gerr / max(gref, 1e-9) < tol[1]

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

    check_dropout_prng()
    check_simmim_kernels(rng)
    print("ok")


def check_dropout_prng():
    """Hardware-PRNG dropout semantics, cross-checked against the interpret
    fallback (ops/fused_layer._keep_mask). CI runs the interpret branch
    (jax.random bits from the same structural key); the chip runs
    pltpu.prng_random_bits. The two BIT STREAMS are different generators by
    design — what must agree (and is asserted here for both) is every
    semantic the training recipe depends on: mask values in
    {0, 1/(1-rate)}, keep fraction = 1-rate, determinism in the
    (seed, block, site) key, and decorrelation across seeds/blocks/sites."""
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from maskedsst_tpu.ops.fused_layer import _keep_mask

    rows, cols, blocks, rate = 256, 128, 2, 0.1

    def kern(seed_ref, o_ref, *, site, interpret):
        o_ref[:] = _keep_mask(
            (rows, cols), seed_ref[0], pl.program_id(0), site, rate, interpret
        )

    def sample(seed, site, interpret=False):
        return pl.pallas_call(
            partial(kern, site=site, interpret=interpret),
            out_shape=jax.ShapeDtypeStruct((blocks * rows, cols), jnp.float32),
            grid=(blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(
                (rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(jnp.asarray(seed, jnp.int32).reshape(1))

    for interpret in (False, True):
        name = "interpret" if interpret else "mosaic"
        m = np.asarray(sample(7, 1, interpret))
        scale = np.float32(1.0 / (1.0 - rate))
        assert set(np.unique(m)) <= {np.float32(0.0), scale}, name
        keep = (m > 0).mean()
        assert abs(keep - (1 - rate)) < 0.01, (name, keep)
        np.testing.assert_array_equal(m, np.asarray(sample(7, 1, interpret)))
        assert (np.asarray(sample(8, 1, interpret)) != m).mean() > 0.05, name
        assert (np.asarray(sample(7, 3, interpret)) != m).mean() > 0.05, name
        assert (m[:rows] != m[rows:]).mean() > 0.05, name  # blocks decorrelate
        print(f"dropout prng [{name}]: keep {keep:.4f} (target {1-rate}), "
              "values/determinism/decorrelation ok")
    overlap = (np.asarray(sample(7, 1, False)) == np.asarray(sample(7, 1, True))).mean()
    print(f"dropout prng: mosaic-vs-interpret bit overlap {overlap:.3f} "
          "(different generators — semantic invariants above are the contract)")


def check_simmim_kernels(rng):
    """Mosaic lowering + fwd/grad parity of the SimMIM prologue/epilogue
    kernels (ops/fused_embed.py, ops/fused_simmim.py) vs fp32-precision XLA
    oracles at the reference geometry. CPU interpret covers the math
    exactly; this is the only check of the actual TPU lowering."""
    import jax

    from maskedsst_tpu.ops.fused_embed import fused_embed_mask
    from maskedsst_tpu.ops.fused_simmim import fused_decode_l1

    with jax.default_matmul_precision("float32"):
        B, g, p, n, d = 16, 20, 10, 64, 96
        pat = jnp.asarray(rng.standard_normal((B, g, p, n)), jnp.float32)
        m = jnp.asarray(rng.integers(0, 2, (B, g, n)), jnp.float32)
        prs = jnp.asarray(1 + 0.1 * rng.standard_normal(p), jnp.float32)
        prb = jnp.asarray(0.1 * rng.standard_normal(p), jnp.float32)
        k = jnp.asarray(rng.standard_normal((g, p, d)) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((g, d)) * 0.1, jnp.float32)
        pls = jnp.asarray(1 + 0.1 * rng.standard_normal(d), jnp.float32)
        plb = jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)
        pos = jnp.asarray(rng.standard_normal((g, n, d)) * 0.02, jnp.float32)
        mtok = jnp.asarray(rng.standard_normal((d,)) * 0.02, jnp.float32)
        args = (pat, m, prs, prb, k, bias, pls, plb, pos, mtok)

        def emb_fused(*a):
            return (fused_embed_mask(*a, jnp.float32, False) ** 2).sum()

        def emb_xla(pat, m, prs, prb, k, bias, pls, plb, pos, mtok):
            xf = pat.astype(jnp.float32)
            mu = xf.mean(axis=2, keepdims=True)
            z = (xf - mu) * jax.lax.rsqrt(
                ((xf - mu) ** 2).mean(axis=2, keepdims=True) + 1e-5
            )
            xln = z * prs[None, None, :, None] + prb[None, None, :, None]
            t = jnp.einsum("bgpn,gpd->bgnd", xln, k) + bias[None, :, None, :]
            mu2 = t.mean(axis=-1, keepdims=True)
            z2 = (t - mu2) * jax.lax.rsqrt(
                ((t - mu2) ** 2).mean(axis=-1, keepdims=True) + 1e-5
            )
            tok = z2 * pls + plb + pos[None]
            masked = mtok[None, None, None, :] + pos[None]
            return (jnp.where(m[..., None] > 0.5, masked, tok) ** 2).sum()

        def grad_relerr(gf, gx):
            # per-leaf max-abs error normalized by that leaf's max magnitude
            return max(
                float(jnp.max(jnp.abs(a - b)))
                / max(float(jnp.max(jnp.abs(b))), 1e-9)
                for a, b in zip(gf, gx)
            )

        diff_idx = (2, 3, 4, 5, 6, 7, 8, 9)
        vf, gf = jax.jit(jax.value_and_grad(emb_fused, argnums=diff_idx))(*args)
        vx, gx = jax.jit(jax.value_and_grad(emb_xla, argnums=diff_idx))(*args)
        rel = abs(float(vf) - float(vx)) / abs(float(vx))
        gerr = grad_relerr(gf, gx)
        print(f"fused_embed_mask: fwd relerr {rel:.2e}  grad relerr {gerr:.2e}")
        assert rel < 1e-5 and gerr < 1e-3

        # B=32 > the 16-row block cap → grid of 2, so the cross-grid-step
        # accumulation branches (out_ref[:] += partial, dkern/dbias acc)
        # exercise on real hardware, not just in interpret mode
        B2 = 32
        enc = jnp.asarray(rng.standard_normal((B2, g, n, d)), jnp.float32)
        pat2 = jnp.asarray(rng.standard_normal((B2, g, p, n)), jnp.float32)
        kd = jnp.asarray(rng.standard_normal((g, d, p)) * 0.05, jnp.float32)
        bd = jnp.asarray(rng.standard_normal((g, p)) * 0.1, jnp.float32)
        w = jnp.asarray(rng.integers(0, 2, (B2, g * n)), jnp.float32)

        def dec_fused(enc, kd, bd):
            return fused_decode_l1(enc, pat2, kd, bd, w, jnp.float32, False)

        def dec_xla(enc, kd, bd):
            preds = jnp.einsum("bgnd,gdp->bgpn", enc, kd) + bd[None, :, :, None]
            return jnp.sum(jnp.abs(preds - pat2) * w.reshape(B2, g, 1, n))

        vf, gf = jax.jit(jax.value_and_grad(dec_fused, argnums=(0, 1, 2)))(enc, kd, bd)
        vx, gx = jax.jit(jax.value_and_grad(dec_xla, argnums=(0, 1, 2)))(enc, kd, bd)
        rel = abs(float(vf) - float(vx)) / abs(float(vx))
        gerr = grad_relerr(gf, gx)
        print(f"fused_decode_l1: fwd relerr {rel:.2e}  grad relerr {gerr:.2e}")
        assert rel < 1e-5 and gerr < 1e-3


if __name__ == "__main__":
    main()
