"""Fused SimMIM embed prologue as a Pallas TPU kernel.

One pass per batch block over the SimMIM tokenization head: pre-LN over the
patch-pixel axis → blockwise embed matmul (+bias) → post-LN over dim → add
positional table → replace masked tokens with (mask_token + pos). The XLA
expression is ~4-5 small fusions (plus their backward twins) per train step,
each paying the fixed critical-path fusion cost (CLAUDE.md perf model).

Layouts: patches [B, g, p, n] raw pixels (see to_patch_pn: n=64 on lanes),
pos [g, n, d], mask [B, g, n] as 0/1 float, output tokens [B, g, n, d].
Gradients flow to every parameter (pre/post-LN scale+bias, embed kernel and
bias, pos, mask_token). The backward KERNEL only reduces the parameter
grads; the data-input cotangents (patches, mask) are recomputed as plain
XLA ops in the bwd rule (_input_grads_xla) so the train step — where the
batch is a leaf constant — dead-code-eliminates them, while attribution
callers (jax.grad w.r.t. the image) get the same values as the XLA path.

Mosaic broadcast rules (found by bisection on v5e): broadcasting a size-1
SUBLANE dim in rank≥3 (e.g. [1,1,d] + [bbg,n,d]) crashes the compiler,
while leading-dim broadcasts ([g,n,d] → [bb,g,n,d]), lane-1 operands
([rows,1]), and 2-D [rows,d] + [d] adds all lower fine. The kernels
therefore receive the per-pixel LN params pre-expanded to [p, n] and the
embed bias pre-expanded to [g, n, d] (cheap XLA broadcasts), and apply
every vector term in flattened 2-D.

Deterministic (no PRNG): the SimMIM path applies no dropout before the
encoder (reference vit_simmim_original.py:203-298 has no emb dropout), so
interpret mode covers CPU tests exactly.

Reference semantics: BlockwisePatchEmbedding (src/vit_spatial_spectral.py:
178-229) + the mask-token replacement (src/vit_simmim_original.py:285).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskedsst_tpu.ops.fused_layer import (
    LN_EPS,
    _bdot,
    _compiler_params,
    _ln_bwd,
    largest_divisor,
)


def _fwd_body(pat, m, spn, bpn, kern, bias_gnd, postln_s, postln_b,
              pos, masked_gnd, compute_dtype):
    """Shared forward math. Returns (tokens [bbg, n, d] fp32,
    z1 [bbg, p, n], xln, z2/rsig2 rows for the post-LN, mb)."""
    bb, g, p, n = pat.shape
    d = kern.shape[-1]
    xf = pat.reshape(bb * g, p, n).astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=1, keepdims=True)
    rsig = jax.lax.rsqrt(var + LN_EPS)
    z1 = (xf - mu) * rsig  # [bbg, p, n]
    # pre-LN scale/bias arrive pre-expanded to [p, n]: leading broadcast only
    xln = z1 * jnp.broadcast_to(spn[None], z1.shape) + jnp.broadcast_to(
        bpn[None], z1.shape
    )
    kb = jnp.broadcast_to(kern[None], (bb, g, p, d)).reshape(bb * g, p, d)
    # [bbg, p, n] x [bbg, p, d] contracting p → [bbg, n, d]
    t = _bdot(xln, kb, ((1,), (1,)), compute_dtype)
    # 4-D leading-[None] broadcasts: Mosaic fuses these into the adds
    # without materializing bb copies (the reshape(broadcast_to) form costs
    # ~15 MB of VPU writes per block)
    t4 = t.reshape(bb, g, n, d) + bias_gnd[None].astype(jnp.float32)
    # post-LN in flattened 2-D (the proven fused_layer pattern)
    rows = t4.reshape(bb * g * n, d)
    mu2 = jnp.mean(rows, axis=-1, keepdims=True)
    var2 = jnp.mean((rows - mu2) ** 2, axis=-1, keepdims=True)
    rsig2 = jax.lax.rsqrt(var2 + LN_EPS)
    z2 = (rows - mu2) * rsig2
    t2 = (z2 * postln_s + postln_b).reshape(bb, g, n, d)  # [bbgn,d]x[d] 2-D
    tokens = t2 + pos[None].astype(jnp.float32)
    # masked table (pos + mask_token) is precomputed in XLA: a 1-D + 3-D
    # add in-kernel crashes Mosaic (sublane-1 broadcast)
    mb = m[:, :, :, None].astype(jnp.float32)  # [bb, g, n, 1]
    tokens = tokens * (1.0 - mb) + masked_gnd[None].astype(jnp.float32) * mb
    return tokens.reshape(bb * g, n, d), z1, xln, z2, rsig2, mb


def _fwd_kernel(
    pat_ref, m_ref, spn_ref, bpn_ref, kern_ref, bias_ref,
    postln_s_ref, postln_b_ref, pos_ref, masked_ref, out_ref, *, compute_dtype,
):
    bb, g, p, n = pat_ref.shape
    d = kern_ref.shape[-1]
    tokens, *_ = _fwd_body(
        pat_ref[:], m_ref[:], spn_ref[:], bpn_ref[:], kern_ref[:], bias_ref[:],
        postln_s_ref[:], postln_b_ref[:], pos_ref[:], masked_ref[:], compute_dtype,
    )
    out_ref[:] = tokens.reshape(bb, g, n, d).astype(out_ref.dtype)


def _bwd_kernel(
    pat_ref, m_ref, spn_ref, bpn_ref, kern_ref, bias_ref,
    postln_s_ref, postln_b_ref, pos_ref, masked_ref, dtok_ref,
    dprs_ref, dprb_ref, dkern_ref, dbias_ref, dpos_s_ref, dpos_b_ref,
    dpos_ref, dmasked_ref, *, compute_dtype,
):
    bb, g, p, n = pat_ref.shape
    d = kern_ref.shape[-1]
    _, z1, xln, z2, rsig2, mb = _fwd_body(
        pat_ref[:], m_ref[:], spn_ref[:], bpn_ref[:], kern_ref[:], bias_ref[:],
        postln_s_ref[:], postln_b_ref[:], pos_ref[:], masked_ref[:], compute_dtype,
    )
    dtok4 = dtok_ref[:].astype(jnp.float32)  # [bb, g, n, d]

    # select bwd: kept branch → (t2 + pos); masked branch → masked table
    dkept4 = dtok4 * (1.0 - mb)
    dpos = jnp.sum(dkept4, axis=0)  # [g, n, d]
    dmasked = jnp.sum(dtok4 * mb, axis=0)  # [g, n, d]

    dt2 = dkept4.reshape(bb * g * n, d)  # post-LN output grad
    dt, dpls, dplb = _ln_bwd(dt2, z2, rsig2, postln_s_ref[:])
    dbias = jnp.sum(dt.reshape(bb, g, n, d), axis=0)  # [g,n,d]; → [g,d] outside
    dt3 = dt.reshape(bb * g, n, d)

    # dkern [g, p, d]: contract n; sum over the block's batch rows
    dk = _bdot(xln, dt3, ((2,), (1,)), compute_dtype)  # [bbg, p, d]
    dk = jnp.sum(dk.reshape(bb, g, p, d), axis=0)
    # pre-LN parameter grads only (patches carry no gradient)
    kb = jnp.broadcast_to(kern_ref[:][None], (bb, g, p, d)).reshape(bb * g, p, d)
    dxln = _bdot(kb, dt3, ((2,), (2,)), compute_dtype)  # [bbg, p, n]
    dprs = jnp.sum(dxln * z1, axis=(0, 2))  # [p]
    dprb = jnp.sum(dxln, axis=(0, 2))  # [p]

    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:] = val.astype(ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:] = ref[:] + val.astype(ref.dtype)

    acc(dprs_ref, dprs)
    acc(dprb_ref, dprb)
    acc(dkern_ref, dk)
    acc(dbias_ref, dbias)
    acc(dpos_s_ref, dpls)
    acc(dpos_b_ref, dplb)
    acc(dpos_ref, dpos)
    acc(dmasked_ref, dmasked)


def _choose_block(batch: int) -> int:
    # device-time-tuned rows-per-grid-step cap for this kernel
    return largest_divisor(batch, 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_embed_mask(
    patches_pn: jax.Array,
    mask: jax.Array,
    preln_scale: jax.Array,
    preln_bias: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    postln_scale: jax.Array,
    postln_bias: jax.Array,
    pos: jax.Array,
    mask_token: jax.Array,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """SimMIM tokenization head → tokens [B, g, n, d].

    patches_pn [B, g, p, n] raw pixels; mask [B, g, n] 0/1 float;
    preln_scale/bias [p]; kernel [g, p, d]; bias [g, d]; postln_scale/bias
    [d]; pos [g, n, d]; mask_token [d]. Output dtype follows compute_dtype
    when it is low-precision (matching the XLA path's LayerNorm(dtype=...)
    output), else float32.
    """
    if patches_pn.shape[0] == 0:
        # grid 0 would leave the backward's accumulated param grads
        # uninitialized (see fused_layer.largest_divisor)
        raise ValueError("fused_embed_mask: empty batch (B == 0)")
    return _fwd_impl(
        patches_pn, mask, preln_scale, preln_bias, kernel, bias,
        postln_scale, postln_bias, pos, mask_token, compute_dtype, interpret,
    )


def _in_specs(bb, pat_s, m_s):
    return [
        pl.BlockSpec((bb, *pat_s[1:]), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, *m_s[1:]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8


def _out_dtype(compute_dtype):
    return compute_dtype if jnp.dtype(compute_dtype).itemsize < 4 else jnp.float32


def _expand(preln_s, preln_b, bias, pos, mask_token, n):
    """Pre-expand the sublane-broadcast params and the masked-token table
    (see module docstring)."""
    spn = jnp.broadcast_to(preln_s[:, None], (preln_s.shape[0], n))
    bpn = jnp.broadcast_to(preln_b[:, None], (preln_b.shape[0], n))
    bias_gnd = jnp.broadcast_to(bias[:, None, :], (bias.shape[0], n, bias.shape[1]))
    masked_gnd = pos + mask_token[None, None, :]
    return spn, bpn, bias_gnd, masked_gnd


def _fwd_impl(patches_pn, mask, preln_s, preln_b, kernel, bias,
              postln_s, postln_b, pos, mask_token, compute_dtype, interpret):
    b, g, p, n = patches_pn.shape
    d = kernel.shape[-1]
    bb = _choose_block(b)
    spn, bpn, bias_gnd, masked_gnd = _expand(
        preln_s, preln_b, bias, pos, mask_token, n
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((b, g, n, d), _out_dtype(compute_dtype)),
        grid=(b // bb,),
        in_specs=_in_specs(bb, patches_pn.shape, mask.shape),
        out_specs=pl.BlockSpec(
            (bb, g, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(patches_pn, mask, spn, bpn, kernel, bias_gnd, postln_s, postln_b,
      pos, masked_gnd)


def _input_grads_xla(patches_pn, mask, preln_s, preln_b, kernel, bias,
                     postln_s, postln_b, pos, mask_token, compute_dtype, dtok):
    """True cotangents for the DATA inputs (patches_pn, mask), recomputed
    as plain XLA ops. In the train step these are unused (the batch is a
    leaf constant) and XLA dead-code-eliminates the whole chain, so the hot
    path pays nothing; input-attribution callers (saliency, adversarial
    probing) get the same gradients the fused=False XLA path produces
    instead of silent zeros."""
    b, g, p, n = patches_pn.shape
    d = kernel.shape[-1]
    xf = patches_pn.reshape(b * g, p, n).astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=1, keepdims=True)
    rsig = jax.lax.rsqrt(var + LN_EPS)
    z1 = (xf - mu) * rsig
    xln = z1 * preln_s[None, :, None] + preln_b[None, :, None]
    kb = jnp.broadcast_to(kernel[None], (b, g, p, d)).reshape(b * g, p, d)
    t = _bdot(xln, kb, ((1,), (1,)), compute_dtype)  # [bg, n, d]
    t4 = t.reshape(b, g, n, d) + bias[None, :, None, :].astype(jnp.float32)
    rows = t4.reshape(b * g * n, d)
    mu2 = jnp.mean(rows, axis=-1, keepdims=True)
    var2 = jnp.mean((rows - mu2) ** 2, axis=-1, keepdims=True)
    rsig2 = jax.lax.rsqrt(var2 + LN_EPS)
    z2 = (rows - mu2) * rsig2
    t2 = (z2 * postln_s + postln_b).reshape(b, g, n, d)
    kept = t2 + pos[None].astype(jnp.float32)  # pre-select tokens
    mb = mask[:, :, :, None].astype(jnp.float32)
    masked_gnd = (pos + mask_token[None, None, :]).astype(jnp.float32)

    dtok4 = dtok.astype(jnp.float32)
    # select bwd: tokens = kept·(1−m) + masked·m
    dmask = jnp.sum(dtok4 * (masked_gnd[None] - kept), axis=-1)
    dkept = dtok4 * (1.0 - mb)
    # post-LN bwd (param-grad outputs unused here — XLA DCEs them; this
    # function produces input cotangents only)
    dt2 = dkept.reshape(b * g * n, d)
    dt, _, _ = _ln_bwd(dt2, z2, rsig2, postln_s)
    dt3 = dt.reshape(b * g, n, d)
    # embed matmul bwd to xln, then pre-LN bwd to raw pixels
    dxln = _bdot(kb, dt3, ((2,), (2,)), compute_dtype)  # [bg, p, n]
    dz1 = dxln * preln_s[None, :, None]
    dxf = rsig * (
        dz1
        - jnp.mean(dz1, axis=1, keepdims=True)
        - z1 * jnp.mean(dz1 * z1, axis=1, keepdims=True)
    )
    return (
        dxf.reshape(b, g, p, n).astype(patches_pn.dtype),
        dmask.astype(mask.dtype),
    )


def _fwd_rule(patches_pn, mask, preln_s, preln_b, kernel, bias,
              postln_s, postln_b, pos, mask_token, compute_dtype, interpret):
    out = _fwd_impl(
        patches_pn, mask, preln_s, preln_b, kernel, bias, postln_s, postln_b,
        pos, mask_token, compute_dtype, interpret,
    )
    return out, (patches_pn, mask, preln_s, preln_b, kernel, bias,
                 postln_s, postln_b, pos, mask_token)


def _bwd_rule(compute_dtype, interpret, residuals, dtok):
    (patches_pn, mask, preln_s, preln_b, kernel, bias,
     postln_s, postln_b, pos, mask_token) = residuals
    b, g, p, n = patches_pn.shape
    d = kernel.shape[-1]
    bb = _choose_block(b)
    spn, bpn, bias_gnd, masked_gnd = _expand(
        preln_s, preln_b, bias, pos, mask_token, n
    )
    grad_shapes = (
        jax.ShapeDtypeStruct(preln_s.shape, jnp.float32),
        jax.ShapeDtypeStruct(preln_b.shape, jnp.float32),
        jax.ShapeDtypeStruct(kernel.shape, jnp.float32),
        jax.ShapeDtypeStruct((g, n, d), jnp.float32),  # dbias pre-reduction
        jax.ShapeDtypeStruct(postln_s.shape, jnp.float32),
        jax.ShapeDtypeStruct(postln_b.shape, jnp.float32),
        jax.ShapeDtypeStruct(pos.shape, jnp.float32),  # dpos (kept branch)
        jax.ShapeDtypeStruct(pos.shape, jnp.float32),  # dmasked table
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, compute_dtype=compute_dtype),
        out_shape=grad_shapes,
        grid=(b // bb,),
        in_specs=_in_specs(bb, patches_pn.shape, mask.shape)
        + [
            pl.BlockSpec(
                (bb, g, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=tuple(
            pl.BlockSpec(
                sh.shape,
                (lambda nd: (lambda i: (0,) * nd))(len(sh.shape)),
                memory_space=pltpu.VMEM,
            )
            for sh in grad_shapes
        ),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(patches_pn, mask, spn, bpn, kernel, bias_gnd, postln_s, postln_b,
      pos, masked_gnd, dtok)
    (dprs, dprb, dkern, dbias_gnd, dpls, dplb, dpos_kept, dmasked) = outs
    # data-input cotangents in XLA: DCE'd by the train step, real values
    # for attribution callers (the kernel itself only reduces param grads)
    dpatches, dmask = _input_grads_xla(
        patches_pn, mask, preln_s, preln_b, kernel, bias,
        postln_s, postln_b, pos, mask_token, compute_dtype, dtok,
    )
    # the masked table is pos + mask_token → its cotangent feeds both
    return (
        dpatches,
        dmask,
        dprs.astype(preln_s.dtype),
        dprb.astype(preln_b.dtype),
        dkern.astype(kernel.dtype),
        jnp.sum(dbias_gnd, axis=1).astype(bias.dtype),  # [g, n, d] → [g, d]
        dpls.astype(postln_s.dtype),
        dplb.astype(postln_b.dtype),
        (dpos_kept + dmasked).astype(pos.dtype),
        jnp.sum(dmasked, axis=(0, 1)).astype(mask_token.dtype),
    )


fused_embed_mask.defvjp(_fwd_rule, _bwd_rule)
