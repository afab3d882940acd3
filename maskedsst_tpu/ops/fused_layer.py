"""Fused pre-norm transformer layer as a Pallas TPU kernel.

Why: at MaskedSST's shapes (dim 96, seq 64/20, heads 8x64) the XLA layer
materializes the attention score/weight tensors in HBM with half-padded
layouts (64 < 128 lanes), costing ~2-3 ms per sub-op per layer on hardware
where the matmul FLOPs are essentially free. This kernel keeps the whole
layer in VMEM: per grid block it computes LN1 → QKV → attention (+ dropout)
→ output projection (+ dropout) → residual → LN2 → GELU MLP (+ dropouts) →
residual, with only the [block, seq, dim] token slab moving through HBM.

Attention runs LOOP-FREE with Mosaic's single-batch-dim ``tpu.matmul``: the
QKV/output projections use head-major weight layouts ``[H, D, 3dh]`` /
``[H, dh, D]`` (prepared from the canonical flax params outside the kernel —
pure layout transforms), scores/AV batch over the merged (head, block-row)
axis, and the output projection contracts per head then sums. No per-head
Python unrolling — short Mosaic programs that pipeline well.

Semantics match maskedsst_tpu.models.layers.TransformerBlock exactly
(reference src/vit_spatial_spectral.py:22-104): LN eps 1e-5 with fp32
statistics, exact (erf) GELU, fp32 softmax, fp32 MXU accumulation, and the
reference's four dropout sites at the configured rate.

Training runs fused end-to-end through a custom VJP: the backward kernel
recomputes activations blockwise in VMEM and accumulates parameter gradients
across sequential grid steps in fp32 output accumulators. Dropout masks are
regenerated bit-exactly in the backward pass from the TPU PRNG, seeded by
(layer seed, GLOBAL block index, site) — whenever dropout is active,
forward and backward use the same block size so the masks agree (with
dropout inactive the forward may take the larger eval_fwd block; no PRNG
state exists then, see _choose_block).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5

# Scoped-VMEM ceiling for the kernels. The Mosaic default (16 MB) caps the
# backward kernel at ~8 rows/block; device-time profiles (scripts/
# kernel_tune.py) show per-call time still falling at 16-32 rows, so raise
# the ceiling (v5e has 128 MB VMEM; leave headroom for double-buffered block
# DMA).
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _bdot(a, b, dims, compute_dtype):
    """Single-batch-dim dot_general with fp32 accumulation (shared by the
    SimMIM prologue/epilogue kernels); ``dims`` is
    ((lhs_contract,), (rhs_contract,))."""
    return jax.lax.dot_general(
        a.astype(compute_dtype),
        b.astype(compute_dtype),
        (dims, ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

# Compute QKV as ONE full-lane [GS, D] x [D, 3I] matmul (3I = 1536 lanes,
# 100% tile fill) plus 24 per-head lane-slice scratch stores, instead of the
# head-major batched [H, GS, D] x [H, D, 3dh] form (192-lane instances, 75%
# fill of 2 tiles, plus an h broadcast); the backward stages dq/dk/dv into a
# [GS, 3I] scratch and takes full-lane dwqkv/dh1 matmuls. Round 1 rejected
# this under the 16 MB VMEM limit with wall-clock timing; re-measured with
# device-time A/B (scripts/kernel_tune.py --full-lane, v5e, ms/layer,
# head-major → full-lane):
#   spatial  g16 fwdbwd 3.370 → 3.176 (−5.8%)   [the train block size]
#   spatial  g32 fwd    1.084 → 1.077 (wash)    [the eval block size]
#   spectral g32 fwdbwd 4.357 → 4.359 (wash)    [the train block size]
#   spectral g32 fwd    1.270 → 1.169 (−8.0%)   [the eval block size]
#   (spectral g16, unused in production: fwd +4.6%, fwdbwd +2.1%)
# Net: wins or ties every production configuration — ON by default. The
# False path is kept as the A/B control (kernel_tune runs without
# --full-lane) and for any future geometry where short-seq folding favors
# the head-major form. Flip BEFORE tracing.
FULL_LANE_QKV = True

# Same trick for the output projection: stage the per-head attention
# outputs into a [GS, I] VMEM scratch (8 lane-slice stores) and take ONE
# full-lane [GS, I] x [I, D] matmul against the canonical wout, instead of
# the head-major batched [H, GS, dh] x [H, dh, D] contraction + a VPU sum
# pass over the [H, GS, D] per-head products (8x the token slab). The
# backward mirrors it: dwout/dO become full-lane matmuls against the [GS, I]
# staging buffers.
#
# Unlike FULL_LANE_QKV this is a split decision, so the default is a
# measured per-kernel rule ("auto"). Device A/B (kernel_tune, v5e,
# ms/layer, head-major-proj → full-lane-proj, FULL_LANE_QKV on in both):
#   spatial  g16 fwd 1.065→1.212  fwdbwd 3.176→3.351   (worse everywhere)
#   spatial  g32 fwd 1.077→1.160  fwdbwd 3.489→3.632
#   spectral g32 fwd 1.168→1.230  fwdbwd 4.359→3.852
#   spectral g16 fwd 1.351→1.342  fwdbwd 4.526→4.068
# Decomposed (fwdbwd − fwd): the WIN is entirely in the spectral backward
# (3.191→2.622, −18%); every standalone forward and all of spatial prefer
# head-major. Dropout masks are seeded structurally (site id + global block
# index, not call order), so the forward and backward kernels may choose
# different proj forms without breaking mask agreement. "auto" = full-lane
# in the backward kernel at short sequences (seq < 32), head-major
# elsewhere. True/False force one form in both kernels (kernel_tune
# --full-lane-proj / --head-major-proj).
FULL_LANE_PROJ = "auto"

# Odd-seq bf16 slabs (see _odd_packed_slab: Mosaic rejects the (g, s, d) →
# (g*s, d) shape cast when s is odd in a 2-rows-per-sublane dtype) have two
# lowering routes, A/B'd on v5e at the Houston spectral geometry
# ((4096, 5), g32, chain 8, kernel_tune --geometry houston, round 4):
#   True  — zero-pad seq → seq+1 in XLA, keep bf16 I/O, mask pad keys in
#           the softmax (pad queries/grads are zero and sliced outside;
#           weight grads stay exact because the pad rows' upstream grads
#           are zero): fwd 0.500 / fwdbwd 1.539 ms/layer
#   False — promote slab I/O to fp32 (2x DMA, kernel math unchanged):
#           fwd 0.540 / fwdbwd 1.630 ms/layer
# The PAD route wins ~6-7% per layer despite the fold-16 block growing
# fS 80 → 96 (larger scores matmul): halved slab DMA + the cheaper bf16
# VMEM traffic beat the extra masked FLOPs, and the full Houston pretrain
# step confirms end-to-end (bench_geometries device step 10.878 → 10.317
# ms, −5.2%, pad/slice XLA glue included). Default since round 4; the
# fp32 route remains both the A/B control (kernel_tune --odd-seq-fp32)
# and the only interpret-mode-verified exactness baseline.
ODD_SEQ_PAD = True


def _proj_full_lane(seq: int, bwd: bool) -> bool:
    """Resolve the output-projection form for one kernel (see
    FULL_LANE_PROJ)."""
    if FULL_LANE_PROJ == "auto":
        return bwd and seq < 32
    return bool(FULL_LANE_PROJ)

# dropout site ids (distinct constants mixed into the PRNG seed)
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


def _to_headmajor_qkv(params: LayerParams, heads: int, dim_head: int):
    """Canonical [D, 3I] QKV weights → head-major [H, D, 3dh] kernel
    layout. Pure (differentiable) layout transform; the out-projection's
    head-major form is a plain reshape done where a kernel asks for it
    (:func:`_kernel_inputs`, per the FULL_LANE_PROJ="auto" rule).

    The attention scale 1/√dh is folded into the Q weights here, so the
    kernel never spends a VPU pass multiplying the [*, S, S] score tensor
    by it (the largest arrays in the kernel are score-shaped; every saved
    pass over them is ~0.05 ms/layer at the reference geometry)."""
    d = params.wqkv.shape[0]
    wq, wk, wv = jnp.split(params.wqkv, 3, axis=1)
    wq = wq * (dim_head**-0.5)

    def heads_first(w):  # [D, I] → [H, D, dh]
        return w.reshape(d, heads, dim_head).transpose(1, 0, 2)

    return jnp.concatenate(
        [heads_first(wq), heads_first(wk), heads_first(wv)], axis=-1
    )  # [H, D, 3dh]


def _from_headmajor_qkv_grad(dwqkv3, heads: int, dim_head: int):
    """Inverse of :func:`_to_headmajor_qkv` for the QKV-weight gradient
    (including the folded attention scale on the Q block). The output
    projection's gradient is layout-independent of this transform — its
    untransform is a plain reshape at the call site."""
    d = dwqkv3.shape[1]

    def heads_back(w3):  # [H, D, dh] → [D, I]
        return w3.transpose(1, 0, 2).reshape(d, heads * dim_head)

    dq = heads_back(dwqkv3[:, :, :dim_head]) * (dim_head**-0.5)
    dk = heads_back(dwqkv3[:, :, dim_head : 2 * dim_head])
    dv = heads_back(dwqkv3[:, :, 2 * dim_head :])
    return jnp.concatenate([dq, dk, dv], axis=1)  # [D, 3I]


def _to_fulllane(params: LayerParams, dim_head: int):
    """Canonical [D, 3I] QKV weights with the attention scale folded into
    the Q block (the full-lane kernel consumes the canonical layout
    directly — no head-major transpose)."""
    i = params.wqkv.shape[1] // 3
    scale = jnp.concatenate(
        [jnp.full((i,), dim_head**-0.5, params.wqkv.dtype),
         jnp.ones((2 * i,), params.wqkv.dtype)]
    )
    return params.wqkv * scale


def _from_fulllane_grad(dwqkv_scaled, dim_head: int):
    """Undo the folded Q scale on a [D, 3I] gradient."""
    i = dwqkv_scaled.shape[1] // 3
    scale = jnp.concatenate(
        [jnp.full((i,), dim_head**-0.5, dwqkv_scaled.dtype),
         jnp.ones((2 * i,), dwqkv_scaled.dtype)]
    )
    return dwqkv_scaled * scale


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


def _bmm(a, b, compute_dtype, trans_a=False, trans_b=False):
    """Batched matmul over leading dim: [B, M, K] x [B, K, N] → [B, M, N]
    (Mosaic supports exactly one batch dim)."""
    ca = 1 if trans_a else 2
    cb = 2 if trans_b else 1
    return jax.lax.dot_general(
        a.astype(compute_dtype),
        b.astype(compute_dtype),
        (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _keep_mask(shape, seed, block, site, rate, interpret=False):
    """Deterministic dropout keep-mask scaled by 1/(1-rate); seeded by
    (layer seed, global grid block, site) so the backward kernel regenerates
    identical bits. Returns fp32 multiplier.

    ``interpret``: ``pltpu.prng_seed`` has no CPU-interpret lowering, so
    interpret-mode kernels derive the bits from the SAME structural key
    through the Threefry path of ``jax.random`` instead. Everything CI can
    meaningfully pin is identical between the two generators — the uniform
    uint32 → keep-threshold comparison, the 1/(1-rate) scaling, and the
    structural (seed, block, site) keying that makes the backward kernel's
    recompute agree with the forward — but the raw bit STREAMS differ
    (Mosaic's is the hardware PRNG, implementation-defined and not
    reproducible off-chip), so on-chip outputs differ from interpret
    outputs at equal seeds; scripts/tpu_kernel_check.py pins the same
    semantic invariants against the hardware stream."""
    mixed = seed + block * jnp.int32(-1640531527) + jnp.int32(site * 40503)
    threshold = jnp.uint32(int(rate * (2**32)))
    if interpret:
        bits = jax.random.bits(
            jax.random.PRNGKey(mixed.astype(jnp.uint32)), shape, jnp.uint32
        )
        keep = bits >= threshold
    else:
        pltpu.prng_seed(mixed)
        bits = pltpu.prng_random_bits(shape)
        keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    return keep.astype(jnp.float32) * (1.0 / (1.0 - rate))


class _DropoutCtx:
    """Per-kernel dropout helper; no-op when rate == 0 or eval."""

    def __init__(self, seed_ref, rate: float, train: bool, interpret: bool = False):
        self.enabled = train and rate > 0.0
        self.rate = rate
        self.interpret = interpret
        if self.enabled:
            self.seed = seed_ref[0]
        self.block = pl.program_id(0)

    def apply(self, x, site):
        if not self.enabled:
            return x
        return x * _keep_mask(
            x.shape, self.seed, self.block, site, self.rate, self.interpret
        )

    def mask(self, shape, site):
        if not self.enabled:
            return None
        return _keep_mask(shape, self.seed, self.block, site, self.rate, self.interpret)


def _choose_fold(seq: int, g: int) -> int:
    """Sequences folded into one block-diagonal attention dot. Short folded
    axes waste MXU lanes (S=20 pads to 128); folding f sequences gives
    [f*S, f*S] scores with a block-diagonal mask — extra FLOPs off the
    diagonal are free next to the lane-utilization win. Padded VMEM use is
    unchanged (f*S ≤ 128 still occupies one 128-lane tile). Folding is a
    measured win only for short sequences (seq 20: −31% layer time); at
    seq 64 it is a wash, so sequences ≥ 32 are left unfolded.

    Fold cap: fS ≤ 80, not 128. Both device-measured optima sit there —
    seq 20: fold 4 (fS 80) beats 2 (3.801 vs 3.887 ms fwdbwd, round 3);
    seq 6 (Houston ODD_SEQ_PAD): fold 8 (fS 48) beats 16 (fS 96: fwd
    0.500→0.473, fwdbwd 1.539→1.529, round 4). Past ~80 lanes the
    off-diagonal waste of the f²-growing masked scores matmul overtakes
    the residual lane-padding win."""
    fold = 1
    f = 2
    while seq < 32 and f <= g and g % f == 0 and f * seq <= 80:
        fold, f = f, f * 2
    return fold


def _attn_mask(fold: int, seq: int, seq_real: int):
    """Validity mask for the folded scores matrix, or None when every
    position is valid. Combines the block-diagonal fold mask with the
    pad-key mask of the ODD_SEQ_PAD route (positions seq_real..seq-1 of
    each folded sequence are zero-pad tokens: they must not be attended TO;
    their own query rows produce garbage that the caller slices away)."""
    if fold == 1 and seq_real == seq:
        return None
    fs = fold * seq
    row = jax.lax.broadcasted_iota(jnp.int32, (fs, fs), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (fs, fs), 1)
    mask = row // seq == col // seq if fold > 1 else jnp.bool_(True)
    if seq_real != seq:
        mask = jnp.logical_and(mask, col % seq < seq_real)
    return mask[None]  # [1, fS, fS], broadcast over batch


def _attn_fwd(h, wqkv_ref, drop, heads, dim_head, seq, g, compute_dtype, want_cache=False, qkv_scratch=None, seq_real=None):
    """h [G*S, D] layer-normed tokens → (attention heads output
    [H, G*S, dh], cache) — fully batched, no per-head loops. `fold`
    independent sequences share one block-diagonal scores matmul; masked
    (−1e30) off-diagonal softmax terms are exactly 0, so results equal the
    per-sequence computation.

    Two QKV-projection forms (numerically identical — q/k/v reach the
    score/AV matmuls through the same compute_dtype cast either way):
    head-major batched (default, ``wqkv_ref`` is [H, D, 3dh]) or, when
    ``qkv_scratch`` refs are passed, one full-lane [GS, D] x [D, 3I]
    matmul whose per-head 64-lane slices are staged through VMEM scratch
    (``wqkv_ref`` is the canonical [D, 3I])."""
    gs = h.shape[0]
    fold = _choose_fold(seq, g)
    nb, fs = heads * g // fold, fold * seq
    # q arrives pre-scaled by 1/sqrt(dh) (folded into the weights,
    # _to_headmajor_qkv/_to_fulllane) — scores need no scaling pass
    if qkv_scratch is not None:
        q_s, k_s, v_s = qkv_scratch
        qkv = _mm(h, wqkv_ref[:], compute_dtype)  # [GS, 3I] fp32
        i = heads * dim_head
        for hh in range(heads):
            lo, hi = hh * dim_head, (hh + 1) * dim_head
            q_s[hh] = qkv[:, lo:hi].astype(q_s.dtype)
            k_s[hh] = qkv[:, i + lo : i + hi].astype(k_s.dtype)
            v_s[hh] = qkv[:, 2 * i + lo : 2 * i + hi].astype(v_s.dtype)
        q = q_s[:].reshape(nb, fs, dim_head)
        k = k_s[:].reshape(nb, fs, dim_head)
        v = v_s[:].reshape(nb, fs, dim_head)
    else:
        hb = jnp.broadcast_to(h.astype(compute_dtype)[None], (heads, gs, h.shape[1]))
        qkvh = _bmm(hb, wqkv_ref[:], compute_dtype)  # [H, GS, 3dh]
        q = qkvh[:, :, :dim_head].reshape(nb, fs, dim_head)
        k = qkvh[:, :, dim_head : 2 * dim_head].reshape(nb, fs, dim_head)
        v = qkvh[:, :, 2 * dim_head :].reshape(nb, fs, dim_head)
    s = _bmm(q, k, compute_dtype, trans_b=True)  # [HG/f, fS, fS]
    mask = _attn_mask(fold, seq, seq if seq_real is None else seq_real)
    if mask is not None:
        s = jnp.where(mask, s, jnp.float32(-1e30))
    # numerically safe softmax (row-max subtraction): a clamp-based max-free
    # variant measured ~neutral here and risks distorted attention + wrong
    # clamped-entry gradients on logit spikes — not worth it
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    a = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
    a_mask = drop.mask(a.shape, _SITE_ATTN)
    a_d = a * a_mask if a_mask is not None else a
    o = _bmm(a_d, v, compute_dtype)  # [HG/f, fS, dh]
    o = o.reshape(heads, gs, dim_head)
    cache = (q, k, v, a, a_d, a_mask) if want_cache else None
    return o, cache


def _layer_fwd_kernel(
    seed_ref,
    x_ref,
    ln1s_ref, ln1b_ref, wqkv3_ref, wout3_ref, bout_ref,
    ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref,
    *scratch,
    heads, dim_head, seq, compute_dtype, dropout_rate, train, proj_dropout=True,
    interpret=False, seq_real=None,
):
    g, s, d = x_ref.shape
    drop = _DropoutCtx(seed_ref, dropout_rate, train, interpret)
    x = x_ref[:].reshape(g * s, d).astype(jnp.float32)

    h = _ln(x, ln1s_ref[:], ln1b_ref[:])
    qkv_s, _, o_s, _ = _parse_scratch(scratch, proj_fl=_proj_full_lane(seq, bwd=False))
    o_heads, _ = _attn_fwd(h, wqkv3_ref, drop, heads, dim_head, s, g, compute_dtype,
                           qkv_scratch=qkv_s, seq_real=seq_real)
    proj = _proj_fwd(o_heads, wout3_ref, bout_ref, o_s, heads, dim_head, compute_dtype)
    if proj_dropout:
        proj = drop.apply(proj, _SITE_PROJ)
    x = x + proj

    h2 = _ln(x, ln2s_ref[:], ln2b_ref[:])
    hid = _gelu_exact(_mm(h2, w1_ref[:], compute_dtype) + b1_ref[:].astype(jnp.float32))
    hid = drop.apply(hid, _SITE_FF_MID)
    ff = _mm(hid, w2_ref[:], compute_dtype) + b2_ref[:].astype(jnp.float32)
    ff = drop.apply(ff, _SITE_FF_OUT)
    x = x + ff

    o_ref[:] = x.reshape(g, s, d).astype(o_ref.dtype)


def _layer_bwd_kernel(
    seed_ref,
    x_ref, dy_ref,
    ln1s_ref, ln1b_ref, wqkv3_ref, wout3_ref, bout_ref,
    ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    dx_ref,
    dln1s_ref, dln1b_ref, dwqkv3_ref, dwout3_ref, dbout_ref,
    dln2s_ref, dln2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *scratch,
    heads, dim_head, seq, compute_dtype, dropout_rate, train, proj_dropout=True,
    interpret=False, seq_real=None,
):
    g, s, d = x_ref.shape
    gs = g * s
    drop = _DropoutCtx(seed_ref, dropout_rate, train, interpret)
    x0 = x_ref[:].reshape(gs, d).astype(jnp.float32)
    dy = dy_ref[:].reshape(gs, d).astype(jnp.float32)

    # ---- recompute forward (identical masks regenerate from the PRNG) -----
    qkv_s, dqkv_s, o_s, dO_s = _parse_scratch(
        scratch, bwd=True, proj_fl=_proj_full_lane(seq, bwd=True))
    h1, z1, rsig1 = _ln_fwd_stats(x0, ln1s_ref[:], ln1b_ref[:])
    o_heads, cache = _attn_fwd(
        h1, wqkv3_ref, drop, heads, dim_head, s, g, compute_dtype, want_cache=True,
        qkv_scratch=qkv_s, seq_real=seq_real,
    )
    q, k, v, a, a_d, a_mask = cache
    p1 = _proj_fwd(o_heads, wout3_ref, bout_ref, o_s, heads, dim_head, compute_dtype)
    proj_mask = drop.mask(p1.shape, _SITE_PROJ) if proj_dropout else None
    if proj_mask is not None:
        p1 = p1 * proj_mask
    x1 = x0 + p1
    h2, z2, rsig2 = _ln_fwd_stats(x1, ln2s_ref[:], ln2b_ref[:])
    u = _mm(h2, w1_ref[:], compute_dtype) + b1_ref[:].astype(jnp.float32)
    gact = _gelu_exact(u)
    mid_mask = drop.mask(gact.shape, _SITE_FF_MID)
    gd = gact * mid_mask if mid_mask is not None else gact

    # ---- backward ---------------------------------------------------------
    out_mask = drop.mask((gs, d), _SITE_FF_OUT)
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
    if o_s is not None:
        # full-lane: o is already staged in the [GS, I] scratch from the
        # recompute; dwout and dO are single full-lane matmuls
        dwout3 = _mm(o_s[:], dp1, compute_dtype, trans_a=True)  # [I, D]
        dO_flat = _mm(dp1, wout3_ref[:], compute_dtype, trans_b=True)  # [GS, I]
        for hh in range(heads):
            dO_s[hh] = dO_flat[:, hh * dim_head : (hh + 1) * dim_head].astype(dO_s.dtype)
        dOh = dO_s[:]
    else:
        dp1b = jnp.broadcast_to(dp1[None], (heads, gs, d))
        dwout3 = _bmm(o_heads, dp1b, compute_dtype, trans_a=True)  # [H, dh, D]
        dOh = _bmm(dp1b, wout3_ref[:], compute_dtype, trans_b=True)  # [H, GS, dh]

    # folded layout matches _attn_fwd; off-diagonal blocks of `a` (and its
    # ODD_SEQ_PAD pad-key columns) are exactly 0 (softmax of -1e30), which
    # zeroes `ds` there — no explicit mask needed
    fold = _choose_fold(s, g)
    dO = dOh.reshape(heads * g // fold, fold * s, dim_head)
    da_d = _bmm(dO, v, compute_dtype, trans_b=True)  # [HG/f, fS, fS]
    dv = _bmm(a_d, dO, compute_dtype, trans_a=True)  # [HG/f, fS, dh]
    da = da_d * a_mask if a_mask is not None else da_d
    # no attention-scale factor: q is pre-scaled in the weights, so `s` is
    # already the softmax input and ds needs no extra multiply
    ds = (da - jnp.sum(da * a, axis=-1, keepdims=True)) * a
    dq = _bmm(ds, k, compute_dtype)  # [HG/f, fS, dh]
    dk = _bmm(ds, q, compute_dtype, trans_a=True)

    if dqkv_s is not None:
        # full-lane: stage per-head grads into a [GS, 3I] scratch, then one
        # full-K/full-lane matmul pair for the weight grad and dh1
        i = heads * dim_head
        dqh = dq.reshape(heads, gs, dim_head)
        dkh = dk.reshape(heads, gs, dim_head)
        dvh = dv.reshape(heads, gs, dim_head)
        for hh in range(heads):
            lo, hi = hh * dim_head, (hh + 1) * dim_head
            dqkv_s[:, lo:hi] = dqh[hh].astype(dqkv_s.dtype)
            dqkv_s[:, i + lo : i + hi] = dkh[hh].astype(dqkv_s.dtype)
            dqkv_s[:, 2 * i + lo : 2 * i + hi] = dvh[hh].astype(dqkv_s.dtype)
        dqkv = dqkv_s[:]
        dwqkv3 = _mm(h1, dqkv, compute_dtype, trans_a=True)  # [D, 3I]
        dh1 = _mm(dqkv, wqkv3_ref[:], compute_dtype, trans_b=True)  # [GS, D]
    else:
        dqkvh = jnp.concatenate(
            [
                dq.reshape(heads, gs, dim_head),
                dk.reshape(heads, gs, dim_head),
                dv.reshape(heads, gs, dim_head),
            ],
            axis=-1,
        )  # [H, GS, 3dh]
        h1b = jnp.broadcast_to(h1.astype(compute_dtype)[None], (heads, gs, d))
        dwqkv3 = _bmm(h1b, dqkvh, compute_dtype, trans_a=True)  # [H, D, 3dh]
        dh1 = jnp.sum(_bmm(dqkvh, wqkv3_ref[:], compute_dtype, trans_b=True), axis=0)
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
    acc(dwqkv3_ref, dwqkv3)
    acc(dwout3_ref, dwout3)
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


def largest_divisor(batch: int, cap: int) -> int:
    """Largest divisor of ``batch`` that is <= ``cap`` (>= 1).

    Shared rows-per-grid-step chooser for every fused kernel in ops/ — each
    kernel supplies its own device-time-tuned cap (this module's
    ``_choose_block``, fused_embed.py, fused_simmim.py)."""
    if batch <= 0:
        # grid 0: the kernel never runs. Safe only for batch-shaped (empty)
        # outputs — write-once/accumulated outputs (scalar losses, param
        # grads) would come back UNINITIALIZED, so the public entry points
        # reject B == 0 up front.
        return 1
    g = min(cap, batch)
    while batch % g:
        g -= 1
    return g


def _choose_block(batch, seq, compute_dtype=jnp.bfloat16, eval_fwd=False):
    """Rows per grid step (device-time optima on v5e via scripts/
    kernel_tune.py): ~16 rows at seq 64, ~32 at seq 20. Larger blocks beyond
    these measure flat-to-worse (fwd+bwd): more rows amortize per-step
    overhead but the backward's recompute working set starts thrashing VMEM
    (the raised ``_VMEM_LIMIT_BYTES`` makes these sizes compile at all; the
    Mosaic default 16 MB caps the backward at ~8 rows). fp32 compute doubles
    every matmul operand, so it gets half the rows.

    ``eval_fwd``: a forward with dropout inactive. The 16-row seq>=32 choice
    is a *backward-pass* optimum that the forward inherits only to keep the
    program_id-based dropout seeding aligned between the passes; with no
    dropout there is nothing to align, and the serving-geometry sweep
    (``kernel_tune.py --batch 512 --modes fwd --dropout 0``) measures 32
    rows fastest at seq 64 too (7.489 vs 7.626 ms/layer)."""
    target = 32 if eval_fwd else (16 if seq >= 32 else 32)
    if jnp.dtype(compute_dtype).itemsize >= 4:
        target //= 2
    return largest_divisor(batch, target)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
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
    proj_dropout: bool = True,
) -> jax.Array:
    """x [B, S, D] → layer output [B, S, D] (dtype of x).

    ``seed``: int32 scalar array driving the layer's dropout PRNG (ignored
    unless ``train`` and ``dropout_rate > 0``; pass a fresh fold per layer
    and step). ``proj_dropout=False`` skips the post-projection dropout site
    (reference Attention has no to_out — and so no dropout there — when
    heads == 1 and dim_head == dim; callers then pass identity wout)."""
    if not 0.0 <= dropout_rate < 1.0:
        # rate 1.0 would overflow the uint32 keep-threshold and scale the
        # kept values by inf — reject up front with a clear error
        raise ValueError(f"dropout_rate must be in [0, 1), got {dropout_rate}")
    if x.shape[0] == 0:
        # a zero-row batch gives grid 0: the kernel never runs and the
        # backward's accumulated param-grad outputs would be UNINITIALIZED
        # memory, not zeros — reject rather than return garbage gradients
        raise ValueError("fused_transformer_layer: empty batch (B == 0)")
    return _fwd_impl(x, params, seed, heads, dim_head, compute_dtype, dropout_rate, train, interpret, proj_dropout)


def _prep_weights(params, heads, dim_head):
    """(QKV weight repr, CANONICAL [I, D] out-proj) — the out-proj repr a
    given kernel consumes is picked per call in :func:`_kernel_inputs`,
    because under FULL_LANE_PROJ="auto" the forward and backward kernels
    use different forms (the reshape to head-major is a free leading-dim
    split in XLA)."""
    if FULL_LANE_QKV:
        wqkv = _to_fulllane(params, dim_head)
    else:
        wqkv = _to_headmajor_qkv(params, heads, dim_head)
    return wqkv, params.wout


def _scratch_shapes(g, s, heads, dim_head, compute_dtype, bwd=False, proj_fl=False):
    """VMEM scratch for the full-lane stagings (empty when both forms are
    head-major). QKV: q/k/v head-major [H, GS, dh] + (bwd) the [GS, 3I]
    grad-staging buffer. Proj (when ``proj_fl``): the [GS, I]
    attention-output staging buffer + (bwd) the [H, GS, dh] dO staging
    buffer. Order must match :func:`_parse_scratch`."""
    gs, i = g * s, heads * dim_head
    shapes = []
    if FULL_LANE_QKV:
        shapes += [pltpu.VMEM((heads, gs, dim_head), compute_dtype)] * 3
        if bwd:
            shapes.append(pltpu.VMEM((gs, 3 * i), compute_dtype))
    if proj_fl:
        shapes.append(pltpu.VMEM((gs, i), compute_dtype))
        if bwd:
            shapes.append(pltpu.VMEM((heads, gs, dim_head), compute_dtype))
    return shapes


def _parse_scratch(scratch, bwd=False, proj_fl=False):
    """Split the flat kernel scratch tuple per the full-lane switches →
    (qkv_scratch, dqkv_s, o_s, dO_s), any of which may be None."""
    idx = 0
    qkv = dqkv = o_s = dO_s = None
    if FULL_LANE_QKV:
        qkv = scratch[idx : idx + 3]
        idx += 3
        if bwd:
            dqkv = scratch[idx]
            idx += 1
    if proj_fl:
        o_s = scratch[idx]
        idx += 1
        if bwd:
            dO_s = scratch[idx]
            idx += 1
    return qkv, dqkv, o_s, dO_s


def _proj_fwd(o_heads, wout_ref, bout_ref, o_s, heads, dim_head, compute_dtype):
    """Attention output projection → [GS, D] (+bias). Full-lane form when
    ``o_s`` is given: lane-slice-stage heads into [GS, I], one [GS, I] x
    [I, D] matmul against the canonical wout; else head-major batched
    contraction + sum over heads."""
    if o_s is not None:
        for hh in range(heads):
            o_s[:, hh * dim_head : (hh + 1) * dim_head] = o_heads[hh].astype(o_s.dtype)
        p = _mm(o_s[:], wout_ref[:], compute_dtype)
    else:
        p = jnp.sum(_bmm(o_heads, wout_ref[:], compute_dtype), axis=0)
    return p + bout_ref[:].astype(jnp.float32)


def _kernel_inputs(params, seed, heads, dim_head, headmajor=None, proj_fl=False):
    wqkv3, wout = headmajor if headmajor is not None else _prep_weights(
        params, heads, dim_head
    )
    wout3 = wout if proj_fl else wout.reshape(heads, dim_head, -1)
    tensors = (
        params.ln1_scale, params.ln1_bias, wqkv3, wout3, params.bout,
        params.ln2_scale, params.ln2_bias, params.w1, params.b1,
        params.w2, params.b2,
    )
    return jnp.asarray(seed, jnp.int32).reshape(1), tensors


def _odd_packed_slab(s: int, dtype) -> bool:
    """Mosaic cannot shape-cast the (g, s, d) token slab to (g*s, d) when s
    is odd and the dtype packs two rows per 32-bit sublane register (bf16):
    the merge crosses a packed pair (probed on v5e: bf16 s=5 fails
    "unsupported shape cast", s=4/6/10 and every fp32 shape lower fine —
    the Houston2018 spectral geometry, 50 bands → 5 blocks, hits this).
    Such slabs take one of two special routes per the ODD_SEQ_PAD switch
    (see its A/B table): masked zero-padding to an even seq (default), or
    fp32 kernel I/O (the kernel computes the residual stream in fp32
    regardless, so that route is bit-identical to an fp32 input)."""
    return s % 2 == 1 and jnp.dtype(dtype).itemsize == 2


def _fwd_impl(x, params, seed, heads, dim_head, compute_dtype, dropout_rate, train, interpret, proj_dropout=True, headmajor=None, seq_real=None):
    b, s, d = x.shape
    if seq_real is None and _odd_packed_slab(s, x.dtype):
        if ODD_SEQ_PAD:  # bf16 slab kept; pad token masked in attention
            out = _fwd_impl(
                jnp.pad(x, ((0, 0), (0, 1), (0, 0))), params, seed, heads,
                dim_head, compute_dtype, dropout_rate, train, interpret,
                proj_dropout, headmajor, seq_real=s,
            )
            return out[:, :s, :]
        return _fwd_impl(
            x.astype(jnp.float32), params, seed, heads, dim_head,
            compute_dtype, dropout_rate, train, interpret, proj_dropout,
            headmajor,
        ).astype(x.dtype)
    g = _choose_block(b, s, compute_dtype,
                      eval_fwd=not (train and dropout_rate > 0.0))
    kernel = functools.partial(
        _layer_fwd_kernel,
        heads=heads, dim_head=dim_head, seq=s,
        compute_dtype=compute_dtype, dropout_rate=dropout_rate, train=train,
        proj_dropout=proj_dropout, interpret=interpret, seq_real=seq_real,
    )
    proj_fl = _proj_full_lane(s, bwd=False)
    seed_arr, tensors = _kernel_inputs(params, seed, heads, dim_head, headmajor,
                                       proj_fl=proj_fl)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(b // g,),
        in_specs=[_seed_spec()]
        + [pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
        + _param_specs(),
        out_specs=pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=_scratch_shapes(g, s, heads, dim_head, compute_dtype,
                                       proj_fl=proj_fl),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(seed_arr, x, *tensors)


def _fwd_rule(x, params, seed, heads, dim_head, compute_dtype, dropout_rate, train, interpret, proj_dropout):
    # head-major weight layouts are pure transforms of the params; computing
    # them once here and carrying them as residuals saves the backward pass
    # redoing the reshape/transpose/concat prep (measured ~0.1-0.2 ms/step
    # of XLA glue at the reference recipe)
    headmajor = _prep_weights(params, heads, dim_head)
    out = _fwd_impl(
        x, params, seed, heads, dim_head, compute_dtype, dropout_rate, train,
        interpret, proj_dropout, headmajor,
    )
    return out, (x, params, seed, headmajor)


def _bwd_rule(heads, dim_head, compute_dtype, dropout_rate, train, interpret, proj_dropout, residuals, grad_out):
    x, params, seed, headmajor = residuals
    b, s, d = x.shape
    out_dtype = x.dtype
    seq_real = None
    if _odd_packed_slab(s, x.dtype):  # see _odd_packed_slab / ODD_SEQ_PAD
        if ODD_SEQ_PAD:
            # pad rows carry zero upstream grad, so every weight grad the
            # kernel accumulates is exact; the pad row of dx is sliced off
            seq_real, s = s, s + 1
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
            grad_out = jnp.pad(grad_out, ((0, 0), (0, 1), (0, 0)))
        else:
            x = x.astype(jnp.float32)
            grad_out = grad_out.astype(jnp.float32)
    # the same block size as the forward keeps program_id-based dropout
    # seeding consistent between the passes
    g = _choose_block(b, s, compute_dtype)
    kernel = functools.partial(
        _layer_bwd_kernel,
        heads=heads, dim_head=dim_head, seq=s,
        compute_dtype=compute_dtype, dropout_rate=dropout_rate, train=train,
        proj_dropout=proj_dropout, interpret=interpret, seq_real=seq_real,
    )
    proj_fl = _proj_full_lane(s, bwd=True)
    seed_arr, tensors = _kernel_inputs(params, seed, heads, dim_head, headmajor,
                                       proj_fl=proj_fl)
    grad_shapes = [
        jax.ShapeDtypeStruct(params.ln1_scale.shape, jnp.float32),
        jax.ShapeDtypeStruct(params.ln1_bias.shape, jnp.float32),
        jax.ShapeDtypeStruct(
            (d, 3 * heads * dim_head) if FULL_LANE_QKV else (heads, d, 3 * dim_head),
            jnp.float32,
        ),
        jax.ShapeDtypeStruct(
            (heads * dim_head, d) if proj_fl else (heads, dim_head, d),
            jnp.float32,
        ),
        jax.ShapeDtypeStruct(params.bout.shape, jnp.float32),
        jax.ShapeDtypeStruct(params.ln2_scale.shape, jnp.float32),
        jax.ShapeDtypeStruct(params.ln2_bias.shape, jnp.float32),
        jax.ShapeDtypeStruct(params.w1.shape, jnp.float32),
        jax.ShapeDtypeStruct(params.b1.shape, jnp.float32),
        jax.ShapeDtypeStruct(params.w2.shape, jnp.float32),
        jax.ShapeDtypeStruct(params.b2.shape, jnp.float32),
    ]
    out_shapes = [jax.ShapeDtypeStruct((b, s, d), x.dtype)] + grad_shapes
    out_specs = [pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] + [
        pl.BlockSpec(sh.shape, (lambda nd: (lambda i: (0,) * nd))(len(sh.shape)), memory_space=pltpu.VMEM)
        for sh in grad_shapes
    ]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(b // g,),
        in_specs=[_seed_spec()]
        + [pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 2
        + _param_specs(),
        out_specs=tuple(out_specs),
        scratch_shapes=_scratch_shapes(g, s, heads, dim_head, compute_dtype,
                                       bwd=True, proj_fl=proj_fl),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(seed_arr, x, grad_out, *tensors)
    dx = outs[0].astype(out_dtype)
    if seq_real is not None:
        dx = dx[:, :seq_real, :]
    (dln1s, dln1b, dwqkv3, dwout3, dbout, dln2s, dln2b, dw1, db1, dw2, db2) = outs[1:]
    if FULL_LANE_QKV:
        dwqkv = _from_fulllane_grad(dwqkv3, dim_head)
    else:
        dwqkv = _from_headmajor_qkv_grad(dwqkv3, heads, dim_head)
    dwout = dwout3 if proj_fl else dwout3.reshape(heads * dim_head, -1)
    gp = LayerParams(
        ln1_scale=dln1s.astype(params.ln1_scale.dtype),
        ln1_bias=dln1b.astype(params.ln1_bias.dtype),
        wqkv=dwqkv.astype(params.wqkv.dtype),
        wout=dwout.astype(params.wout.dtype),
        bout=dbout.astype(params.bout.dtype),
        ln2_scale=dln2s.astype(params.ln2_scale.dtype),
        ln2_bias=dln2b.astype(params.ln2_bias.dtype),
        w1=dw1.astype(params.w1.dtype),
        b1=db1.astype(params.b1.dtype),
        w2=dw2.astype(params.w2.dtype),
        b2=db2.astype(params.b2.dtype),
    )
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
