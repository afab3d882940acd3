"""Fused SimMIM decode + weighted-L1 epilogue as a Pallas TPU kernel.

The XLA expression of the SimMIM loss tail — per-block decode einsum
(BlockwiseToPixels), |preds − patches|, multiply by the 0/1 loss weights,
global sum — costs several small fusions per step (fwd + their backward
twins). At the reference geometry each is compute-trivial but pays the
fixed per-fusion cost on the dependent critical path (CLAUDE.md perf
model), totalling a few tenths of a millisecond per train step. This
kernel runs the whole tail in one pass per batch block, with a custom-VJP
backward kernel producing d(encoded), d(kernel), d(bias); the data-input
cotangents (targets, weights) are recomputed as DCE-able XLA ops in the
bwd rule (_input_grads_xla).

Layouts (see BlockwisePatchEmbedding.to_patch_pn): encoded [B, g, n, d]
(d=dim on lanes), patches [B, g, p, n] raw pixels (n on lanes — the p-wide
axis never tiles onto the 128-lane dim), weights [B, g*n] 0/1 float.
Everything is deterministic — no PRNG — so interpret mode covers the CPU
test path exactly.

Reference semantics: SimMIMSpatialSpectral.forward decode + L1
(src/vit_simmim_original.py:317-338); the weighting reproduces
ops.masking.loss_weights (first num_masked masked positions per row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskedsst_tpu.ops.fused_layer import _bdot, _compiler_params, largest_divisor


def _decode(enc, kern, bias, compute_dtype):
    """enc [bb, g, n, d] → preds [bb*g, p, n] fp32 (decode contracting d,
    bias added)."""
    bb, g, n, d = enc.shape
    p = kern.shape[-1]
    encb = enc.reshape(bb * g, n, d)
    kb = jnp.broadcast_to(kern[None], (bb, g, d, p)).reshape(bb * g, d, p)
    # [bbg, d, p] x [bbg, n, d] contracting d → [bbg, p, n]
    preds = _bdot(kb, encb, ((1,), (2,)), compute_dtype)
    biasb = jnp.broadcast_to(bias[None, :, :, None], (bb, g, p, 1)).reshape(
        bb * g, p, 1
    )
    return preds + biasb.astype(jnp.float32)


def _fwd_kernel(enc_ref, pat_ref, kern_ref, bias_ref, w_ref, out_ref, *, compute_dtype):
    bb, g, n, d = enc_ref.shape
    p = kern_ref.shape[-1]
    preds = _decode(enc_ref[:], kern_ref[:], bias_ref[:], compute_dtype)
    err = jnp.abs(preds - pat_ref[:].reshape(bb * g, p, n).astype(jnp.float32))
    # weights arrive pre-shaped [B, g, n]: splitting a [B, g*n] lane dim
    # in-kernel is a Mosaic-rejected lane reshape
    w = w_ref[:].reshape(bb * g, 1, n).astype(jnp.float32)
    # (1,1)-shaped stores: Mosaic rejects scalar stores to VMEM
    partial = jnp.sum(err * w).reshape(1, 1)

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        out_ref[:] = partial

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + partial


def _bwd_kernel(
    g_ref, enc_ref, pat_ref, kern_ref, bias_ref, w_ref,
    denc_ref, dkern_ref, dbias_ref, *, compute_dtype,
):
    bb, g, n, d = enc_ref.shape
    p = kern_ref.shape[-1]
    gscale = g_ref[0]
    preds = _decode(enc_ref[:], kern_ref[:], bias_ref[:], compute_dtype)
    diff = preds - pat_ref[:].reshape(bb * g, p, n).astype(jnp.float32)
    w = w_ref[:].reshape(bb * g, 1, n).astype(jnp.float32)  # [B,g,n] input
    # d|x| = sign(x); sign(0) = 0 matches jnp.abs's VJP
    dpred = jnp.sign(diff) * w * gscale  # [bbg, p, n] fp32

    # denc [bbg, n, d]: contract p of dpred with p of kernel
    kb = jnp.broadcast_to(kern_ref[:][None], (bb, g, d, p)).reshape(bb * g, d, p)
    denc = _bdot(dpred, kb, ((1,), (2,)), compute_dtype)  # [bbg, n, d]
    denc_ref[:] = denc.reshape(bb, g, n, d).astype(denc_ref.dtype)

    # dkern [g, d, p]: contract n; sum over the block's batch rows
    encb = enc_ref[:].reshape(bb * g, n, d)
    dk = _bdot(encb, dpred, ((1,), (2,)), compute_dtype)  # [bbg, d, p]
    dk = jnp.sum(dk.reshape(bb, g, d, p), axis=0)
    db = jnp.sum(dpred.reshape(bb, g, p, n), axis=(0, 3))  # [g, p]

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dkern_ref[:] = dk.astype(dkern_ref.dtype)
        dbias_ref[:] = db.astype(dbias_ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _():
        dkern_ref[:] = dkern_ref[:] + dk.astype(dkern_ref.dtype)
        dbias_ref[:] = dbias_ref[:] + db.astype(dbias_ref.dtype)


def _choose_block(batch: int) -> int:
    # device-time-tuned rows-per-grid-step cap for this kernel
    return largest_divisor(batch, 16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_decode_l1(
    encoded: jax.Array,
    patches_pn: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    weights: jax.Array,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """sum(weights · |decode(encoded) − patches|) as one scalar.

    encoded [B, g, n, d]; patches_pn [B, g, p, n] raw pixels; kernel
    [g, d, p]; bias [g, p]; weights [B, g*n] (0/1). The caller applies the
    reference's 1/(B·num_masked·p)/num_masked normalization.
    """
    if encoded.shape[0] == 0:
        # grid 0 never runs the kernel: the write-once (1,1) loss and the
        # accumulated param grads would be uninitialized memory
        raise ValueError("fused_decode_l1: empty batch (B == 0)")
    return _fwd_impl(
        encoded, patches_pn, kernel, bias, weights, compute_dtype, interpret
    )


def _specs(bb, shapes):
    """Block over batch for the batched tensors; whole-array params."""
    enc_s, pat_s, w_s = shapes
    return [
        pl.BlockSpec((bb, *enc_s[1:]), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, *pat_s[1:]), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, *w_s[1:]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]


def _fwd_impl(encoded, patches_pn, kernel, bias, weights, compute_dtype, interpret):
    b, g, n, _ = encoded.shape
    weights = weights.reshape(b, g, n)  # lane-dim split stays outside Mosaic
    bb = _choose_block(b)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=(b // bb,),
        in_specs=_specs(bb, (encoded.shape, patches_pn.shape, weights.shape)),
        out_specs=pl.BlockSpec(
            (1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(encoded, patches_pn, kernel, bias, weights)
    return out[0, 0]


def _input_grads_xla(encoded, patches_pn, kernel, bias, weights, compute_dtype, gout):
    """True cotangents for the DATA inputs (patches_pn targets, weights),
    recomputed as plain XLA ops. The train step never uses them (targets
    and mask weights are leaf constants) so XLA dead-code-eliminates the
    chain; attribution callers get the same gradients as the fused=False
    XLA loss tail instead of silent zeros."""
    b, g, n, d = encoded.shape
    p = kernel.shape[-1]
    encb = encoded.reshape(b * g, n, d)
    kb = jnp.broadcast_to(kernel[None], (b, g, d, p)).reshape(b * g, d, p)
    preds = _bdot(kb, encb, ((1,), (2,)), compute_dtype)  # [bg, p, n]
    biasb = jnp.broadcast_to(bias[None, :, :, None], (b, g, p, 1)).reshape(
        b * g, p, 1
    )
    diff = (preds + biasb.astype(jnp.float32)) - patches_pn.reshape(
        b * g, p, n
    ).astype(jnp.float32)
    w = weights.reshape(b * g, 1, n).astype(jnp.float32)
    gs = jnp.asarray(gout, jnp.float32)
    dpat = (-jnp.sign(diff) * w * gs).reshape(b, g, p, n)
    dw = (jnp.sum(jnp.abs(diff), axis=1) * gs).reshape(weights.shape)
    return dpat.astype(patches_pn.dtype), dw.astype(weights.dtype)


def _fwd_rule(encoded, patches_pn, kernel, bias, weights, compute_dtype, interpret):
    out = _fwd_impl(
        encoded, patches_pn, kernel, bias, weights, compute_dtype, interpret
    )
    return out, (encoded, patches_pn, kernel, bias, weights)


def _bwd_rule(compute_dtype, interpret, residuals, gout):
    encoded, patches_pn, kernel, bias, weights = residuals
    b, g, n, _ = encoded.shape
    w3 = weights.reshape(b, g, n)
    bb = _choose_block(b)
    g_arr = jnp.asarray(gout, jnp.float32).reshape(1)
    denc, dkern, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, compute_dtype=compute_dtype),
        out_shape=(
            jax.ShapeDtypeStruct(encoded.shape, encoded.dtype),
            jax.ShapeDtypeStruct(kernel.shape, jnp.float32),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ),
        grid=(b // bb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _specs(bb, (encoded.shape, patches_pn.shape, w3.shape)),
        out_specs=(
            pl.BlockSpec(
                (bb, *encoded.shape[1:]), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                kernel.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(bias.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(g_arr, encoded, patches_pn, kernel, bias, w3)
    # data-input cotangents in XLA: DCE'd by the train step, real values
    # for attribution callers (the kernel itself only produces denc + param
    # grads)
    dpat, dw = _input_grads_xla(
        encoded, patches_pn, kernel, bias, weights, compute_dtype, gout
    )
    return (
        denc,
        dpat,
        dkern.astype(kernel.dtype),
        dbias.astype(bias.dtype),
        dw,
    )


fused_decode_l1.defvjp(_fwd_rule, _bwd_rule)
