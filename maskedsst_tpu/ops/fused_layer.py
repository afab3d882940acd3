"""Fused pre-norm transformer layer as a Pallas TPU kernel.

Why: at MaskedSST's shapes (dim 96, seq 64/20, heads 8x64) the XLA layer
materializes the attention score/weight tensors in HBM with half-padded
layouts (64 < 128 lanes), costing ~2-3 ms per sub-op per layer on hardware
where the matmul FLOPs are essentially free. This kernel keeps the whole
layer in VMEM: per grid block it computes LN1 → QKV → per-head softmax(QKᵀ)V
(+ dropout) → output projection (+ dropout) → residual → LN2 → GELU MLP
(+ dropouts) → residual, with only the [block, seq, dim] token slab moving
through HBM.

Semantics match maskedsst_tpu.models.layers.TransformerBlock exactly
(reference src/vit_spatial_spectral.py:22-104): LN eps 1e-5 with fp32
statistics, exact (erf) GELU, fp32 softmax, fp32 MXU accumulation, and the
reference's four dropout sites (attention weights, output projection, post-
GELU, post-MLP) at the configured rate.

Training runs fused end-to-end through a custom VJP: the backward kernel
recomputes activations blockwise in VMEM and accumulates parameter gradients
across sequential grid steps in fp32 output accumulators. Dropout masks are
regenerated bit-exactly in the backward pass from the TPU PRNG, seeded by
(layer seed, GLOBAL block-row index, site) — independent of the kernel's
block partitioning, so forward and backward agree even with different block
sizes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5

# dropout site ids (arbitrary distinct odd constants mixed into the seed)
_SITE_ATTN = 1
_SITE_PROJ = 3
_SITE_FF_MID = 5
_SITE_FF_OUT = 7


class LayerParams(NamedTuple):
    """One layer's weights; shapes [D]=dim, [I]=heads*dim_head, [F]=mlp dim."""

    ln1_scale: jax.Array  # [D]
    ln1_bias: jax.Array  # [D]
    wqkv: jax.Array  # [D, 3*I]
    wout: jax.Array  # [I, D]
    bout: jax.Array  # [D]
    ln2_scale: jax.Array  # [D]
    ln2_bias: jax.Array  # [D]
    w1: jax.Array  # [D, F]
    b1: jax.Array  # [F]
    w2: jax.Array  # [F, D]
    b2: jax.Array  # [D]


def _erf(x):
    """erf via the Abramowitz–Stegun 7.1.26 rational approximation (max abs
    error 1.5e-7, far below bf16 resolution). Mosaic lowers neither erf nor
    erfc, so the kernel carries its own."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x):
    """Exact (erf-form) GELU matching torch nn.GELU / jax approximate=False."""
    return 0.5 * x * (1.0 + _erf(x * (2.0**-0.5)))


def _gelu_bwd(u):
    c = 2.0**-0.5
    pdf = jnp.exp(-0.5 * u * u) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    return 0.5 * (1.0 + _erf(u * c)) + u * pdf


def _ln_fwd_stats(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + LN_EPS)
    z = (xf - mu) * rsig
    return z * scale + bias, z, rsig


def _ln(x, scale, bias):
    out, _, _ = _ln_fwd_stats(x, scale, bias)
    return out


def _ln_bwd(dout, z, rsig, scale):
    dbias = jnp.sum(dout, axis=0)
    dscale = jnp.sum(dout * z, axis=0)
    dz = dout * scale
    dx = rsig * (
        dz - jnp.mean(dz, axis=-1, keepdims=True) - z * jnp.mean(dz * z, axis=-1, keepdims=True)
    )
    return dx, dscale, dbias


def _mm(a, b, compute_dtype, trans_a=False, trans_b=False):
    dims = (
        ((0,) if trans_a else (1,)),
        ((1,) if trans_b else (0,)),
    )
    return jax.lax.dot_general(
        a.astype(compute_dtype),
        b.astype(compute_dtype),
        ((dims[0], dims[1]), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _keep_mask(shape, seed, row, site, rate):
    """Deterministic dropout keep-mask scaled by 1/(1-rate). Seeded by
    (layer seed, global row, site) so fwd and bwd regenerate identical bits
    regardless of grid blocking. Returns fp32 multiplier."""
    mixed = seed + row * jnp.int32(-1640531527) + jnp.int32(site * 40503)
    pltpu.prng_seed(mixed)
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(int(rate * (2**32)))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    return keep.astype(jnp.float32) * (1.0 / (1.0 - rate))


class _DropoutCtx:
    """Per-kernel dropout helper; no-op when rate == 0 or eval."""

    def __init__(self, seed_ref, base_row, rate: float, train: bool):
        self.enabled = train and rate > 0.0
        self.rate = rate
        if self.enabled:
            self.seed = seed_ref[0]
        self.base_row = base_row  # global index of the block's first row

    def apply(self, x, local_row, site):
        if not self.enabled:
            return x
        mask = _keep_mask(x.shape, self.seed, self.base_row + local_row, site, self.rate)
        return x * mask

    def mask(self, shape, local_row, site):
        if not self.enabled:
            return None
        return _keep_mask(shape, self.seed, self.base_row + local_row, site, self.rate)


def _fold_heads(seq: int, heads: int) -> bool:
    """Fold all heads of a row into ONE block-diagonal dot when the folded
    size stays MXU-friendly — would replace `heads` tiny [S,dh]x[dh,S] dots
    with a single [H*S, dh]x[dh, H*S] dot for short sequences. DISABLED:
    current Mosaic rejects both the reshape ([S, I] → [S, H, dh], "unsupported
    shape cast") and the slice+row-concat construction ("offset mismatch on
    non-concat dimension"); revisit when the lowering supports either."""
    return False


def _split_qkv_folded(qkv_b, heads, dim_head, seq):
    """qkv_b [S, 3I] → (q', k', v') each [H*S, dh] with head-major rows.
    Built from lane slices + row concat (Mosaic cannot reshape-split the
    128-lane axis)."""
    inner = heads * dim_head

    def fold(base):  # columns [base, base+inner) → [H*S, dh]
        return jnp.concatenate(
            [
                qkv_b[:, base + h * dim_head : base + (h + 1) * dim_head]
                for h in range(heads)
            ],
            axis=0,
        )

    return fold(0), fold(inner), fold(2 * inner)


def _unfold_rows(t, heads, dim_head, seq):
    """[H*S, dh] head-major rows → [S, I] (row slices + lane concat)."""
    return jnp.concatenate(
        [t[h * seq : (h + 1) * seq] for h in range(heads)], axis=1
    )


def _head_block_mask(heads: int, seq: int):
    hs = heads * seq
    row = jax.lax.broadcasted_iota(jnp.int32, (hs, hs), 0) // seq
    col = jax.lax.broadcasted_iota(jnp.int32, (hs, hs), 1) // seq
    return row == col


def _attn_fwd(qkv, drop: _DropoutCtx, heads, dim_head, seq, g, compute_dtype):
    """qkv [G*S, 3I] → attention output [G*S, I] (dropout applied on attn
    weights when enabled)."""
    inner = heads * dim_head
    scale = dim_head**-0.5
    folded = _fold_heads(seq, heads)
    blk_mask = _head_block_mask(heads, seq) if folded else None
    row_outs = []
    for bi in range(g):
        qkv_b = qkv[bi * seq : (bi + 1) * seq]
        if folded:
            qf, kf, vf = _split_qkv_folded(qkv_b, heads, dim_head, seq)
            s = _mm(qf, kf, compute_dtype, trans_b=True)  # [HS, HS]
            s = jnp.where(blk_mask, s * scale, jnp.float32(-1e30))
            a = jax.nn.softmax(s, axis=-1)
            a = drop.apply(a, bi * heads, _SITE_ATTN)
            o = _mm(a, vf, compute_dtype)  # [HS, dh]
            row_outs.append(_unfold_rows(o, heads, dim_head, seq))
            continue
        head_outs = []
        for hd in range(heads):
            q = qkv_b[:, hd * dim_head : (hd + 1) * dim_head]
            k = qkv_b[:, inner + hd * dim_head : inner + (hd + 1) * dim_head]
            v = qkv_b[:, 2 * inner + hd * dim_head : 2 * inner + (hd + 1) * dim_head]
            s = _mm(q, k, compute_dtype, trans_b=True)
            a = jax.nn.softmax(s * scale, axis=-1)
            a = drop.apply(a, bi * heads + hd, _SITE_ATTN)
            head_outs.append(_mm(a, v, compute_dtype))
        row_outs.append(jnp.concatenate(head_outs, axis=1))
    return jnp.concatenate(row_outs, axis=0)


def _layer_fwd_kernel(
    seed_ref,
    x_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, wout_ref, bout_ref,
    ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref,
    *, heads, dim_head, seq, compute_dtype, dropout_rate, train,
):
    g, s, d = x_ref.shape
    base_row = pl.program_id(0) * g
    drop = _DropoutCtx(seed_ref, base_row, dropout_rate, train)
    x = x_ref[:].reshape(g * s, d).astype(jnp.float32)

    h = _ln(x, ln1s_ref[:], ln1b_ref[:])
    qkv = _mm(h, wqkv_ref[:], compute_dtype)
    attn = _attn_fwd(qkv, drop, heads, dim_head, seq, g, compute_dtype)
    proj = _mm(attn, wout_ref[:], compute_dtype) + bout_ref[:].astype(jnp.float32)
    proj = drop.apply(proj, 0, _SITE_PROJ)
    x = x + proj

    h2 = _ln(x, ln2s_ref[:], ln2b_ref[:])
    hid = _gelu_exact(_mm(h2, w1_ref[:], compute_dtype) + b1_ref[:].astype(jnp.float32))
    hid = drop.apply(hid, 0, _SITE_FF_MID)
    ff = _mm(hid, w2_ref[:], compute_dtype) + b2_ref[:].astype(jnp.float32)
    ff = drop.apply(ff, 0, _SITE_FF_OUT)
    x = x + ff

    o_ref[:] = x.reshape(g, s, d).astype(o_ref.dtype)


def _layer_bwd_kernel(
    seed_ref,
    x_ref, dy_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, wout_ref, bout_ref,
    ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    dx_ref,
    dln1s_ref, dln1b_ref, dwqkv_ref, dwout_ref, dbout_ref,
    dln2s_ref, dln2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, heads, dim_head, seq, compute_dtype, dropout_rate, train,
):
    g, s, d = x_ref.shape
    inner = heads * dim_head
    scale = dim_head**-0.5
    base_row = pl.program_id(0) * g
    drop = _DropoutCtx(seed_ref, base_row, dropout_rate, train)
    x0 = x_ref[:].reshape(g * s, d).astype(jnp.float32)
    dy = dy_ref[:].reshape(g * s, d).astype(jnp.float32)

    # ---- recompute forward (identical masks regenerate from the PRNG) -----
    h1, z1, rsig1 = _ln_fwd_stats(x0, ln1s_ref[:], ln1b_ref[:])
    qkv = _mm(h1, wqkv_ref[:], compute_dtype)
    # attention recompute, caching weights for the backward loop
    folded = _fold_heads(seq, heads)
    blk_mask = _head_block_mask(heads, seq) if folded else None
    attn_cache = {}
    row_outs = []
    for bi in range(g):
        qkv_b = qkv[bi * seq : (bi + 1) * seq]
        if folded:
            qf, kf, vf = _split_qkv_folded(qkv_b, heads, dim_head, seq)
            sc = _mm(qf, kf, compute_dtype, trans_b=True)
            sc = jnp.where(blk_mask, sc * scale, jnp.float32(-1e30))
            a = jax.nn.softmax(sc, axis=-1)
            a_mask = drop.mask(a.shape, bi * heads, _SITE_ATTN)
            a_d = a * a_mask if a_mask is not None else a
            attn_cache[bi] = (qf, kf, vf, a, a_d, a_mask)
            o = _mm(a_d, vf, compute_dtype)
            row_outs.append(_unfold_rows(o, heads, dim_head, seq))
            continue
        head_outs = []
        for hd in range(heads):
            q = qkv_b[:, hd * dim_head : (hd + 1) * dim_head]
            k = qkv_b[:, inner + hd * dim_head : inner + (hd + 1) * dim_head]
            v = qkv_b[:, 2 * inner + hd * dim_head : 2 * inner + (hd + 1) * dim_head]
            sc = _mm(q, k, compute_dtype, trans_b=True)
            a = jax.nn.softmax(sc * scale, axis=-1)
            a_mask = drop.mask(a.shape, bi * heads + hd, _SITE_ATTN)
            a_d = a * a_mask if a_mask is not None else a
            attn_cache[(bi, hd)] = (a, a_d, a_mask)
            head_outs.append(_mm(a_d, v, compute_dtype))
        row_outs.append(jnp.concatenate(head_outs, axis=1))
    O = jnp.concatenate(row_outs, axis=0)
    p1 = _mm(O, wout_ref[:], compute_dtype) + bout_ref[:].astype(jnp.float32)
    proj_mask = drop.mask(p1.shape, 0, _SITE_PROJ)
    if proj_mask is not None:
        p1 = p1 * proj_mask
    x1 = x0 + p1
    h2, z2, rsig2 = _ln_fwd_stats(x1, ln2s_ref[:], ln2b_ref[:])
    u = _mm(h2, w1_ref[:], compute_dtype) + b1_ref[:].astype(jnp.float32)
    gact = _gelu_exact(u)
    mid_mask = drop.mask(gact.shape, 0, _SITE_FF_MID)
    gd = gact * mid_mask if mid_mask is not None else gact
    # (ff output mask regenerated below where needed)

    # ---- backward ---------------------------------------------------------
    # y = x1 + drop(gd @ W2 + b2)
    out_mask = drop.mask((g * s, d), 0, _SITE_FF_OUT)
    dp2 = dy * out_mask if out_mask is not None else dy
    db2 = jnp.sum(dp2, axis=0)
    dw2 = _mm(gd, dp2, compute_dtype, trans_a=True)
    dgd = _mm(dp2, w2_ref[:], compute_dtype, trans_b=True)
    dg = dgd * mid_mask if mid_mask is not None else dgd
    du = dg * _gelu_bwd(u)
    db1 = jnp.sum(du, axis=0)
    dw1 = _mm(h2, du, compute_dtype, trans_a=True)
    dh2 = _mm(du, w1_ref[:], compute_dtype, trans_b=True)
    dx1_ln, dln2s, dln2b = _ln_bwd(dh2, z2, rsig2, ln2s_ref[:])
    dx1 = dy + dx1_ln

    dp1 = dx1 * proj_mask if proj_mask is not None else dx1
    dbout = jnp.sum(dp1, axis=0)
    dwout = _mm(O, dp1, compute_dtype, trans_a=True)
    dO = _mm(dp1, wout_ref[:], compute_dtype, trans_b=True)

    dqkv_rows = []
    for bi in range(g):
        qkv_b = qkv[bi * seq : (bi + 1) * seq]
        dO_b = dO[bi * seq : (bi + 1) * seq]
        if folded:
            qf, kf, vf, a, a_d, a_mask = attn_cache[bi]
            dOf = jnp.concatenate(
                [
                    dO_b[:, h * dim_head : (h + 1) * dim_head]
                    for h in range(heads)
                ],
                axis=0,
            )
            da_d = _mm(dOf, vf, compute_dtype, trans_b=True)
            dvf = _mm(a_d, dOf, compute_dtype, trans_a=True)
            da = da_d * a_mask if a_mask is not None else da_d
            # off-diagonal blocks of `a` are exactly 0 (softmax of -1e30),
            # which zeroes ds there — no explicit mask needed
            ds = (da - jnp.sum(da * a, axis=-1, keepdims=True)) * a * scale
            dqf = _mm(ds, kf, compute_dtype)
            dkf = _mm(ds, qf, compute_dtype, trans_a=True)
            dqkv_rows.append(
                jnp.concatenate(
                    [
                        _unfold_rows(dqf, heads, dim_head, seq),
                        _unfold_rows(dkf, heads, dim_head, seq),
                        _unfold_rows(dvf, heads, dim_head, seq),
                    ],
                    axis=1,
                )
            )
            continue
        dq_h, dk_h, dv_h = [], [], []
        for hd in range(heads):
            q = qkv_b[:, hd * dim_head : (hd + 1) * dim_head]
            k = qkv_b[:, inner + hd * dim_head : inner + (hd + 1) * dim_head]
            v = qkv_b[:, 2 * inner + hd * dim_head : 2 * inner + (hd + 1) * dim_head]
            a, a_d, a_mask = attn_cache[(bi, hd)]
            do = dO_b[:, hd * dim_head : (hd + 1) * dim_head]
            da_d = _mm(do, v, compute_dtype, trans_b=True)
            dv = _mm(a_d, do, compute_dtype, trans_a=True)
            da = da_d * a_mask if a_mask is not None else da_d
            ds = (da - jnp.sum(da * a, axis=-1, keepdims=True)) * a * scale
            dq_h.append(_mm(ds, k, compute_dtype))
            dk_h.append(_mm(ds, q, compute_dtype, trans_a=True))
            dv_h.append(dv)
        dqkv_rows.append(
            jnp.concatenate(
                [jnp.concatenate(dq_h, 1), jnp.concatenate(dk_h, 1), jnp.concatenate(dv_h, 1)],
                axis=1,
            )
        )
    dqkv = jnp.concatenate(dqkv_rows, axis=0)

    dwqkv = _mm(h1, dqkv, compute_dtype, trans_a=True)
    dh1 = _mm(dqkv, wqkv_ref[:], compute_dtype, trans_b=True)
    dx0_ln, dln1s, dln1b = _ln_bwd(dh1, z1, rsig1, ln1s_ref[:])
    dx0 = dx1 + dx0_ln

    dx_ref[:] = dx0.reshape(g, s, d).astype(dx_ref.dtype)

    # param-grad accumulation across sequential grid steps
    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:] = val.astype(ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:] = ref[:] + val.astype(ref.dtype)

    acc(dln1s_ref, dln1s)
    acc(dln1b_ref, dln1b)
    acc(dwqkv_ref, dwqkv)
    acc(dwout_ref, dwout)
    acc(dbout_ref, dbout)
    acc(dln2s_ref, dln2s)
    acc(dln2b_ref, dln2b)
    acc(dw1_ref, dw1)
    acc(db1_ref, db1)
    acc(dw2_ref, dw2)
    acc(db2_ref, db2)


def _param_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11


def _seed_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _choose_block(batch, seq, heads, dim_head, target: int = 4):
    """Rows per grid step. Small blocks win: the per-head attention loop is
    statically unrolled, so large blocks emit very long Mosaic programs that
    pipeline worse than more, shorter grid steps (measured optimum ~4 rows
    for both the spatial [1280,64,96] and spectral [4096,20,96] shapes;
    2-3x faster than byte-budget-sized blocks)."""
    g = min(target, batch)
    while batch % g:
        g -= 1
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_transformer_layer(
    x: jax.Array,
    params: LayerParams,
    seed: jax.Array,
    heads: int,
    dim_head: int,
    compute_dtype=jnp.bfloat16,
    dropout_rate: float = 0.0,
    train: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """x [B, S, D] → layer output [B, S, D] (dtype of x).

    ``seed``: int32 scalar array driving the layer's dropout PRNG (ignored
    unless ``train`` and ``dropout_rate > 0``; pass a fresh fold per layer
    and step)."""
    return _fwd_impl(x, params, seed, heads, dim_head, compute_dtype, dropout_rate, train, interpret)


def _fwd_impl(x, params, seed, heads, dim_head, compute_dtype, dropout_rate, train, interpret):
    b, s, d = x.shape
    g = _choose_block(b, s, heads, dim_head)
    kernel = functools.partial(
        _layer_fwd_kernel,
        heads=heads, dim_head=dim_head, seq=s,
        compute_dtype=compute_dtype, dropout_rate=dropout_rate, train=train,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(b // g,),
        in_specs=[_seed_spec()]
        + [pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
        + _param_specs(),
        out_specs=pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), x, *params)


def _fwd_rule(x, params, seed, heads, dim_head, compute_dtype, dropout_rate, train, interpret):
    out = _fwd_impl(x, params, seed, heads, dim_head, compute_dtype, dropout_rate, train, interpret)
    return out, (x, params, seed)


def _bwd_rule(heads, dim_head, compute_dtype, dropout_rate, train, interpret, residuals, grad_out):
    x, params, seed = residuals
    b, s, d = x.shape
    g = _choose_block(b, s, heads, dim_head, target=2)
    kernel = functools.partial(
        _layer_bwd_kernel,
        heads=heads, dim_head=dim_head, seq=s,
        compute_dtype=compute_dtype, dropout_rate=dropout_rate, train=train,
    )
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params]
    out_shapes = [jax.ShapeDtypeStruct((b, s, d), x.dtype)] + grad_shapes
    out_specs = [pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] + [
        pl.BlockSpec(p.shape, (lambda nd: (lambda i: (0,) * nd))(p.ndim), memory_space=pltpu.VMEM)
        for p in params
    ]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(b // g,),
        in_specs=[_seed_spec()]
        + [pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 2
        + _param_specs(),
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), x, grad_out, *params)
    dx = outs[0]
    gp = LayerParams(*[gv.astype(p.dtype) for gv, p in zip(outs[1:], params)])
    return dx, gp, None


fused_transformer_layer.defvjp(_fwd_rule, _bwd_rule)


def _reference_layer(x, params: LayerParams, heads, dim_head, compute_dtype):
    """XLA expression of the identical layer math (parity oracle; no
    dropout)."""
    b, s, d = x.shape
    inner = heads * dim_head
    h = _ln(x, params.ln1_scale, params.ln1_bias)
    qkv = (h.astype(compute_dtype) @ params.wqkv).astype(jnp.float32)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_split(t):
        return t.reshape(b, s, heads, dim_head)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    s_ = jnp.einsum(
        "bnhd,bmhd->bhnm",
        q.astype(compute_dtype),
        k.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    a = jax.nn.softmax(s_ * dim_head**-0.5, axis=-1)
    o = jnp.einsum(
        "bhnm,bmhd->bnhd",
        a.astype(compute_dtype),
        v.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ).reshape(b, s, inner)
    x = x.astype(jnp.float32) + (
        o.astype(compute_dtype) @ params.wout
    ).astype(jnp.float32) + params.bout.astype(jnp.float32)

    h2 = _ln(x, params.ln2_scale, params.ln2_bias)
    hid = (h2.astype(compute_dtype) @ params.w1).astype(jnp.float32) + params.b1.astype(jnp.float32)
    hid = jax.nn.gelu(hid, approximate=False)
    ff = (hid.astype(compute_dtype) @ params.w2).astype(jnp.float32) + params.b2.astype(jnp.float32)
    return (x + ff).astype(jnp.float32)
