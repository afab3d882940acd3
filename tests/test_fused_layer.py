"""Fused Pallas transformer-layer tests (interpret mode on CPU).

Checks: forward/gradient parity vs the XLA expression of the same math,
dropout determinism/semantics, param-tree interchangeability between
Transformer and FusedTransformer, and end-to-end model parity."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskedsst_tpu.models import ViTSpatialSpectral
from maskedsst_tpu.ops.fused_layer import (
    LayerParams,
    _reference_layer,
    fused_transformer_layer,
)

D, H, DH, F = 24, 2, 8, 16
I = H * DH


def _params(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    s = lambda k, shape: (jax.random.normal(k, shape) * 0.1).astype(jnp.float32)
    return LayerParams(
        ln1_scale=jnp.ones((D,)),
        ln1_bias=jnp.zeros((D,)),
        wqkv=s(ks[0], (D, 3 * I)),
        wout=s(ks[1], (I, D)),
        bout=jnp.zeros((D,)),
        ln2_scale=jnp.ones((D,)),
        ln2_bias=jnp.zeros((D,)),
        w1=s(ks[2], (D, F)),
        b1=jnp.zeros((F,)),
        w2=s(ks[3], (F, D)),
        b2=jnp.zeros((D,)),
    )


SEED = jnp.zeros((), jnp.int32)


def _fused(x, p, rate=0.0, train=False, seed=SEED):
    return fused_transformer_layer(x, p, seed, H, DH, jnp.float32, rate, train, True)


def test_forward_parity():
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, D))
    want = _reference_layer(x, p, H, DH, jnp.float32)
    got = _fused(x, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_grad_parity():
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 16, D))

    def loss_f(x, p):
        return (_fused(x, p) ** 2).mean()

    def loss_r(x, p):
        return (_reference_layer(x, p, H, DH, jnp.float32) ** 2).mean()

    gx_f, gp_f = jax.grad(loss_f, argnums=(0, 1))(x, p)
    gx_r, gp_r = jax.grad(loss_r, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-5, rtol=1e-3)
    for name in p._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(gp_f, name)),
            np.asarray(getattr(gp_r, name)),
            atol=1e-4,
            rtol=2e-3,
            err_msg=name,
        )


def test_keep_mask_interpret_semantics():
    """The interpret-mode PRNG fallback (pltpu.prng_seed has no CPU
    lowering) must carry the exact semantics the chip executes: values in
    {0, 1/(1-rate)}, keep fraction ≈ 1-rate, deterministic in the
    structural (seed, block, site) key, and decorrelated across sites and
    blocks — the same invariants scripts/tpu_kernel_check.py pins against
    the hardware bit stream."""
    from maskedsst_tpu.ops.fused_layer import _keep_mask

    rate = 0.3
    args = (jnp.int32(7), jnp.int32(2), 5)
    m = np.asarray(_keep_mask((64, 128), *args, rate, interpret=True))
    scale = 1.0 / (1.0 - rate)
    assert set(np.unique(m)) <= {0.0, np.float32(scale)}
    assert abs((m > 0).mean() - (1 - rate)) < 0.03
    m2 = np.asarray(_keep_mask((64, 128), *args, rate, interpret=True))
    np.testing.assert_array_equal(m, m2)  # deterministic
    for other in (
        (jnp.int32(8), jnp.int32(2), 5),   # different layer seed
        (jnp.int32(7), jnp.int32(3), 5),   # different grid block
        (jnp.int32(7), jnp.int32(2), 7),   # different dropout site
    ):
        mo = np.asarray(_keep_mask((64, 128), *other, rate, interpret=True))
        assert (mo != m).mean() > 0.2


def test_dropout_semantics():
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 16, D))
    eval_out = _fused(x, p, rate=0.5, train=False)
    np.testing.assert_allclose(
        np.asarray(eval_out), np.asarray(_fused(x, p)), atol=1e-6
    )  # eval ignores dropout
    a = _fused(x, p, rate=0.5, train=True, seed=jnp.int32(7))
    b = _fused(x, p, rate=0.5, train=True, seed=jnp.int32(7))
    c = _fused(x, p, rate=0.5, train=True, seed=jnp.int32(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # deterministic
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4  # seed-sensitive
    assert np.abs(np.asarray(a) - np.asarray(eval_out)).max() > 1e-4


def test_dropout_grad_uses_same_mask():
    """grad of sum through dropout must be consistent with the fwd mask:
    finite-difference along one input coordinate."""
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, D))

    def loss(x):
        return (_fused(x, p, rate=0.3, train=True, seed=jnp.int32(5)) ** 2).mean()

    g = jax.grad(loss)(x)
    eps = 1e-3
    d = jnp.zeros_like(x).at[0, 0, 0].set(1.0)
    fd = (loss(x + eps * d) - loss(x - eps * d)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0, 0]), float(fd), rtol=2e-2, atol=1e-4)


def test_no_projection_dropout_fwd_bwd_consistent():
    """heads==1 / dim_head==dim (proj_dropout=False, identity wout): in train
    mode with dropout>0 the gradient must match the executed forward — round 1
    applied the _SITE_PROJ mask in the forward but skipped it in the backward
    recompute, silently training against a different forward. Pin with a
    finite difference through the actual loss."""
    ks = jax.random.split(jax.random.PRNGKey(9), 2)
    sc = lambda k, shape: (jax.random.normal(k, shape) * 0.1).astype(jnp.float32)
    p = LayerParams(
        ln1_scale=jnp.ones((D,)),
        ln1_bias=jnp.zeros((D,)),
        wqkv=sc(ks[0], (D, 3 * D)),
        wout=jnp.eye(D, dtype=jnp.float32),
        bout=jnp.zeros((D,)),
        ln2_scale=jnp.ones((D,)),
        ln2_bias=jnp.zeros((D,)),
        w1=sc(ks[1], (D, F)),
        b1=jnp.zeros((F,)),
        w2=sc(jax.random.PRNGKey(10), (F, D)),
        b2=jnp.zeros((D,)),
    )
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 16, D))

    def loss(x):
        out = fused_transformer_layer(
            x, p, jnp.int32(5), 1, D, jnp.float32, 0.3, True, True, False
        )
        return (out**2).mean()

    g = jax.grad(loss)(x)
    eps = 1e-3
    d = jnp.zeros_like(x).at[0, 0, 0].set(1.0)
    fd = (loss(x + eps * d) - loss(x - eps * d)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0, 0]), float(fd), rtol=2e-2, atol=1e-4)


def test_model_param_tree_interchangeable():
    kw = dict(
        image_size=4,
        spatial_patch_size=1,
        spectral_patch_size=10,
        num_classes=3,
        dim=D,
        depth=2,
        heads=H,
        dim_head=DH,
        mlp_dim=F,
        channels=20,
        spectral_pos=[0, 1],
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 20, 4, 4)), jnp.float32)
    m_xla = ViTSpatialSpectral(**kw, fused=False)
    m_fused = FusedModel = ViTSpatialSpectral(**kw, fused=True)
    p = jax.jit(functools.partial(m_xla.init, deterministic=True))(
        jax.random.PRNGKey(0), x
    )["params"]
    import jax.tree_util as jtu

    pf = jax.jit(functools.partial(m_fused.init, deterministic=True))(
        jax.random.PRNGKey(0), x
    )["params"]
    paths_xla = {jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(p)[0]}
    paths_fused = {jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(pf)[0]}
    assert paths_xla == paths_fused


def test_model_forward_parity_fused_vs_xla():
    kw = dict(
        image_size=4,
        spatial_patch_size=1,
        spectral_patch_size=10,
        num_classes=3,
        dim=D,
        depth=2,
        heads=H,
        dim_head=DH,
        mlp_dim=F,
        channels=20,
        spectral_pos=[0, 1],
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 20, 4, 4)), jnp.float32)
    m_xla = ViTSpatialSpectral(**kw, fused=False)
    p = m_xla.init(jax.random.PRNGKey(0), x, deterministic=True)["params"]
    out_xla = m_xla.apply({"params": p}, x, deterministic=True)

    # FusedTransformer auto-falls back to interpret mode on CPU
    m_fused = ViTSpatialSpectral(**kw, fused=True)
    out_fused = m_fused.apply({"params": p}, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), atol=5e-5, rtol=1e-3
    )


def test_fused_matches_xla_when_no_projection():
    """heads==1 and dim_head==dim: the reference Attention (and Transformer)
    has NO output projection; FusedTransformer must produce the identical
    param tree and outputs (identity wout inside the kernel, no proj
    dropout site)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskedsst_tpu.models.layers import FusedTransformer, Transformer

    kw = dict(dim=16, depth=2, heads=1, dim_head=16, mlp_dim=8, dropout=0.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 6, 16)), jnp.float32)
    fused = FusedTransformer(**kw, interpret=True)
    variables = fused.init(jax.random.PRNGKey(0), x, deterministic=True)
    # param tree carries no to_out (matches Transformer / the importer)
    assert "to_out" not in variables["params"]["layers_0"]["attn"]

    ref = Transformer(**kw)
    want = ref.apply(variables, x, deterministic=True)
    got = fused.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_fused_decode_l1_matches_xla():
    """The fused SimMIM decode+weighted-L1 epilogue kernel (interpret on
    CPU) must reproduce the XLA loss AND its gradients exactly (fp32):
    fused=True routes the loss tail through ops/fused_simmim.py."""
    from maskedsst_tpu.models import SimMIMSpatialSpectral, ViTSpatialSpectral
    from maskedsst_tpu.ops.masking import MaskGenerator

    kw = dict(
        image_size=8, spatial_patch_size=1, spectral_patch_size=10,
        num_classes=3, dim=D, depth=2, heads=H, dim_head=DH, mlp_dim=F,
        channels=40, spectral_pos=[0, 1, 2, 3],
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 40, 8, 8)), jnp.float32
    )
    bool_mask = MaskGenerator(8, 4, 1, 0.7).batch_masks(
        jax.random.PRNGKey(3), 4, 4, True
    )

    losses, grads = {}, {}
    params = None
    for fused in (False, True):
        enc = ViTSpatialSpectral(**kw, fused=fused)
        mim = SimMIMSpatialSpectral(
            encoder=enc, masking_ratio=0.7, mask_patch_size=4,
            tube_masking=True, to_pixels_per_spectral_block=True,
        )
        if params is None:
            params = mim.init(
                {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
                x, deterministic=True,
            )["params"]

        def loss_fn(p, mim=mim):
            return mim.apply(
                {"params": p}, x, deterministic=True, bool_mask=bool_mask
            )

        losses[fused], grads[fused] = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(losses[True]), float(losses[False]), rtol=1e-6)
    import jax.tree_util as jtu

    for (ka, ga), (kb, gb) in zip(
        jtu.tree_flatten_with_path(grads[True])[0],
        jtu.tree_flatten_with_path(grads[False])[0],
    ):
        assert jtu.keystr(ka) == jtu.keystr(kb)
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), atol=1e-5, rtol=1e-4,
            err_msg=jtu.keystr(ka),
        )


def test_choose_block_eval_forward():
    """Dropout-inactive forwards take the 32-row block; training forwards
    keep the 16-row fwd+bwd optimum so program_id-based dropout seeding
    stays aligned with the backward kernel (fused_layer.py:_bwd_rule)."""
    from maskedsst_tpu.ops.fused_layer import _choose_block

    # seq >= 32: training 16 rows, eval 32
    assert _choose_block(1280, 64) == 16
    assert _choose_block(1280, 64, eval_fwd=True) == 32
    # short seq: 32 either way
    assert _choose_block(4096, 20) == 32
    assert _choose_block(4096, 20, eval_fwd=True) == 32
    # block must divide the row count and never exceed it
    assert _choose_block(24, 64, eval_fwd=True) == 24
    g = _choose_block(20, 64, eval_fwd=True)
    assert 20 % g == 0


def test_fused_input_gradients_match_xla():
    """jax.grad w.r.t. the INPUT IMAGE must agree between fused=True and
    fused=False: the fused embed/decode custom VJPs recompute the data-input
    cotangents in XLA (_input_grads_xla) instead of returning silent zeros
    (saliency/attribution contract; the train step DCEs these)."""
    from maskedsst_tpu.models import SimMIMSpatialSpectral, ViTSpatialSpectral
    from maskedsst_tpu.ops.masking import MaskGenerator

    kw = dict(
        image_size=8, spatial_patch_size=1, spectral_patch_size=10,
        num_classes=3, dim=D, depth=2, heads=H, dim_head=DH, mlp_dim=F,
        channels=40, spectral_pos=[0, 1, 2, 3],
    )
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((4, 40, 8, 8)), jnp.float32
    )
    bool_mask = MaskGenerator(8, 4, 1, 0.7).batch_masks(
        jax.random.PRNGKey(3), 4, 4, True
    )

    img_grads, logit_grads = {}, {}
    params = enc_params = None
    for fused in (False, True):
        enc = ViTSpatialSpectral(**kw, fused=fused)
        mim = SimMIMSpatialSpectral(
            encoder=enc, masking_ratio=0.7, mask_patch_size=4,
            tube_masking=True, to_pixels_per_spectral_block=True,
        )
        if params is None:
            params = mim.init(
                {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
                x, deterministic=True,
            )["params"]
            # SimMIM init never touches the classifier head → init the
            # encoder separately for the logits leg (verify-skill seam)
            enc_params = enc.init(
                jax.random.PRNGKey(2), x, deterministic=True
            )["params"]

        # SimMIM loss: image feeds BOTH the embed prologue (patches) and
        # the L1 targets — exercises both kernels' input cotangents
        img_grads[fused] = jax.grad(
            lambda xx, mim=mim: mim.apply(
                {"params": params}, xx, deterministic=True, bool_mask=bool_mask
            )
        )(x)
        # classifier forward: embed prologue only
        logit_grads[fused] = jax.grad(
            lambda xx, enc=enc: enc.apply(
                {"params": enc_params}, xx, deterministic=True
            ).sum()
        )(x)

    assert float(jnp.abs(img_grads[True]).max()) > 0.0
    np.testing.assert_allclose(
        np.asarray(img_grads[True]), np.asarray(img_grads[False]),
        atol=1e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(logit_grads[True]), np.asarray(logit_grads[False]),
        atol=1e-4, rtol=1e-4,
    )


def test_fused_layer_guards():
    """Entry-point guards: dropout_rate 1.0 would overflow the uint32
    keep-threshold (reject with a clear error); an empty batch must pick a
    valid block size instead of dividing by zero."""
    import pytest

    from maskedsst_tpu.ops.fused_layer import (
        LayerParams, fused_transformer_layer, largest_divisor,
    )

    assert largest_divisor(0, 8) == 1
    assert largest_divisor(6, 8) == 6
    assert largest_divisor(12, 8) == 6

    x = jnp.zeros((2, 4, 8), jnp.float32)
    params = jax.tree.map(
        jnp.asarray,
        LayerParams(
            ln1_scale=np.ones(8, np.float32), ln1_bias=np.zeros(8, np.float32),
            wqkv=np.zeros((8, 24), np.float32), wout=np.zeros((8, 8), np.float32),
            bout=np.zeros(8, np.float32),
            ln2_scale=np.ones(8, np.float32), ln2_bias=np.zeros(8, np.float32),
            w1=np.zeros((8, 4), np.float32), b1=np.zeros(4, np.float32),
            w2=np.zeros((4, 8), np.float32), b2=np.zeros(8, np.float32),
        ),
    )
    with pytest.raises(ValueError, match="dropout_rate"):
        fused_transformer_layer(
            x, params, jnp.int32(0), 1, 8, dropout_rate=1.0, train=True,
            interpret=True,
        )


def test_odd_seq_bf16_slab_special_routing():
    """Houston2018 spectral geometry (50 bands -> 5 blocks: seq 5, bf16
    activations). Mosaic rejects the (g, 5, d) bf16 slab shape-cast (odd seq
    crosses the packed sublane pair — probed on v5e), so the entry routes
    such slabs specially (fused_layer._odd_packed_slab): by default through
    the ODD_SEQ_PAD masked-pad route (the measured round-4 winner), with
    fp32 slab I/O as the A/B control. The default route must match the XLA
    oracle in values and gradients and preserve the input dtype; the fp32
    control must be bit-identical to running the kernel on the fp32 upcast
    directly (same kernel program, only the slab I/O dtype differs)."""
    from maskedsst_tpu.ops import fused_layer as fl
    from maskedsst_tpu.ops.fused_layer import _odd_packed_slab

    assert _odd_packed_slab(5, jnp.bfloat16)
    assert not _odd_packed_slab(6, jnp.bfloat16)
    assert not _odd_packed_slab(5, jnp.float32)
    assert not _odd_packed_slab(20, jnp.bfloat16)

    p = _params()
    x32 = jax.random.normal(jax.random.PRNGKey(7), (8, 5, D))
    xbf = x32.astype(jnp.bfloat16)

    got = _fused(xbf, p)  # default: ODD_SEQ_PAD route
    assert got.dtype == jnp.bfloat16
    want = _reference_layer(xbf.astype(jnp.float32), p, H, DH, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.05, rtol=0.05
    )

    # the fp32-I/O control is bit-identical to the fp32-upcast input path
    assert fl.ODD_SEQ_PAD is True  # the measured production default
    try:
        fl.ODD_SEQ_PAD = False
        got_fp32 = _fused(xbf, p)
    finally:
        fl.ODD_SEQ_PAD = True
    same = _fused(xbf.astype(jnp.float32), p)
    np.testing.assert_array_equal(
        np.asarray(got_fp32, np.float32),
        np.asarray(same.astype(jnp.bfloat16), np.float32),
    )

    def loss(x, p):
        return (_fused(x, p).astype(jnp.float32) ** 2).mean()

    gx, gp = jax.grad(loss, argnums=(0, 1))(xbf, p)
    assert gx.dtype == jnp.bfloat16
    gx_r = jax.grad(
        lambda x, p: (_reference_layer(x, p, H, DH, jnp.float32) ** 2).mean(),
        argnums=0,
    )(xbf.astype(jnp.float32), p)
    np.testing.assert_allclose(
        np.asarray(gx, np.float32), np.asarray(gx_r), atol=0.05, rtol=0.1
    )


def test_odd_seq_pad_route_matches_fp32_route():
    """The default ODD_SEQ_PAD route (zero-pad seq 5→6, bf16 slab I/O kept,
    pad key masked out of the softmax) must be numerically identical to the
    fp32-I/O control route: both kernels compute the residual stream in
    fp32 from the same bf16-exact inputs, and the pad token contributes
    nothing (masked as a key, sliced away as a query, zero upstream grad in
    the backward — so the weight grads the pad-route kernel accumulates
    over the padded rows are exact, not approximations). Equality is up to
    reduction-order rounding only: padding grows the attention matmuls' K
    dimension (fS 40→48 here), which reorders the sums of the surviving
    terms even though every pad term is exactly zero."""
    from maskedsst_tpu.ops import fused_layer as fl

    p = _params(3)
    xbf = jax.random.normal(jax.random.PRNGKey(11), (8, 5, D)).astype(jnp.bfloat16)

    def loss(x, p):
        return (_fused(x, p).astype(jnp.float32) ** 2).mean()

    out_pad = _fused(xbf, p)  # default route (ODD_SEQ_PAD=True)
    gx_pad, gp_pad = jax.grad(loss, argnums=(0, 1))(xbf, p)
    assert fl.ODD_SEQ_PAD is True  # the measured production default
    try:
        fl.ODD_SEQ_PAD = False
        out_fp32 = _fused(xbf, p)
        gx_fp32, gp_fp32 = jax.grad(loss, argnums=(0, 1))(xbf, p)
    finally:
        fl.ODD_SEQ_PAD = True

    assert out_pad.dtype == jnp.bfloat16 and gx_pad.dtype == jnp.bfloat16
    assert out_pad.shape == (8, 5, D) and gx_pad.shape == (8, 5, D)
    # bf16 tensors: equal to 1 ulp (reduction-order rounding can flip the
    # last bit of a value sitting on a rounding boundary)
    np.testing.assert_allclose(
        np.asarray(out_pad, np.float32), np.asarray(out_fp32, np.float32),
        rtol=1e-2, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(gx_pad, np.float32), np.asarray(gx_fp32, np.float32),
        rtol=1e-2, atol=1e-4,
    )
    # fp32 param grads: tight
    for a, b in zip(jax.tree_util.tree_leaves(gp_pad), jax.tree_util.tree_leaves(gp_fp32)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5
        )


def test_proj_form_auto_rule():
    """FULL_LANE_PROJ='auto' resolves per kernel: full-lane only in the
    backward at short sequences (the measured split decision — see the
    A/B table at fused_layer.FULL_LANE_PROJ). Pins the rule so a refactor
    cannot silently flip a production kernel onto the losing form."""
    from maskedsst_tpu.ops import fused_layer as fl

    assert fl.FULL_LANE_PROJ == "auto"
    assert fl._proj_full_lane(20, bwd=True)       # spectral train bwd: FL
    assert not fl._proj_full_lane(20, bwd=False)  # spectral fwd: head-major
    assert not fl._proj_full_lane(64, bwd=True)   # spatial bwd: head-major
    assert not fl._proj_full_lane(64, bwd=False)
    assert fl._proj_full_lane(5, bwd=True)        # Houston spectral bwd: FL

    # forced modes override per-kernel resolution (kernel_tune A/B controls)
    old = fl.FULL_LANE_PROJ
    try:
        fl.FULL_LANE_PROJ = True
        assert fl._proj_full_lane(64, bwd=False)
        fl.FULL_LANE_PROJ = False
        assert not fl._proj_full_lane(20, bwd=True)
    finally:
        fl.FULL_LANE_PROJ = old

    # scratch layout stays consistent with the parse on both switches
    shapes_fwd = fl._scratch_shapes(8, 20, 8, 64, jnp.bfloat16, proj_fl=True)
    shapes_bwd = fl._scratch_shapes(8, 20, 8, 64, jnp.bfloat16, bwd=True, proj_fl=True)
    n_qkv_fwd = 3 if fl.FULL_LANE_QKV else 0
    n_qkv_bwd = 4 if fl.FULL_LANE_QKV else 0
    assert len(shapes_fwd) == n_qkv_fwd + 1
    assert len(shapes_bwd) == n_qkv_bwd + 2
