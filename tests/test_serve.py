"""Serving-path tests: the mesh-sharded Predictor matches direct apply,
handles ragged batches, BatchNorm models, and on-device postprocessing."""

import jax
import jax.numpy as jnp
import numpy as np

from maskedsst_tpu.models import ViTSpatialSpectral
from maskedsst_tpu.parallel.mesh import get_mesh
from maskedsst_tpu.serve import Predictor


def _vit():
    return ViTSpatialSpectral(
        image_size=8, spatial_patch_size=1, spectral_patch_size=10, num_classes=6,
        dim=24, depth=2, heads=2, dim_head=8, mlp_dim=16, channels=40,
        spectral_pos=[0, 1, 2, 3],
    )


def test_predictor_matches_direct_apply_with_ragged_tail():
    model = _vit()
    x = np.random.default_rng(0).standard_normal((19, 40, 8, 8)).astype(np.float32)
    variables = jax.jit(lambda k, v: model.init(k, v, deterministic=True))(
        jax.random.PRNGKey(0), jnp.asarray(x[:1])
    )
    pred = Predictor(model, variables, batch_size=8)
    got = pred(x)  # 19 = 2 full chunks + ragged 3
    want = np.asarray(model.apply(variables, jnp.asarray(x), deterministic=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_predictor_postprocess_and_batch_stats():
    from maskedsst_tpu.models.zoo import get_model

    model, _, _, hp = get_model("liu", n_classes=4, n_bands=12, ignored_labels=[0])
    p = hp["patch_size"]
    x = np.random.default_rng(1).standard_normal((10, 12, p, p)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x[:2]),
        deterministic=True,
    )
    pred = Predictor(
        model, variables, batch_size=8,
        postprocess=lambda logits: jnp.argmax(logits, axis=-1),
    )
    got = pred(x)
    logits, _ = model.apply(variables, jnp.asarray(x), deterministic=True)
    want = np.asarray(jnp.argmax(logits, axis=-1))
    np.testing.assert_array_equal(got, want)


def test_predictor_empty_input():
    model = _vit()
    x = np.zeros((1, 40, 8, 8), np.float32)
    variables = jax.jit(lambda k, v: model.init(k, v, deterministic=True))(
        jax.random.PRNGKey(0), jnp.asarray(x)
    )
    pred = Predictor(model, variables, batch_size=8)
    out = pred(np.zeros((0, 40, 8, 8), np.float32))
    # the empty result must keep the output's trailing dims + dtype so
    # downstream concatenation / class-axis indexing works
    ref = pred(np.zeros((2, 40, 8, 8), np.float32))
    assert out.shape == (0, *ref.shape[1:])
    assert out.dtype == ref.dtype
    np.testing.assert_array_equal(
        np.concatenate([out, ref]), ref
    )


def test_predictor_fused_serving_geometry():
    """Predictor with the FUSED model (interpret mode on CPU) at serving
    batch geometry (batch_size 256, ragged input) must match the unfused
    model's outputs — pins the deployed fused path end-to-end
    (scripts/serving_bench.py runs fused=True at batch 256-1024)."""
    kw = dict(
        image_size=8, spatial_patch_size=1, spectral_patch_size=10, num_classes=6,
        dim=24, depth=2, heads=2, dim_head=8, mlp_dim=16, channels=40,
        spectral_pos=[0, 1, 2, 3],
    )
    m_xla = ViTSpatialSpectral(**kw, fused=False)
    m_fused = ViTSpatialSpectral(**kw, fused=True)
    x = np.random.default_rng(0).standard_normal((300, 40, 8, 8)).astype(np.float32)
    variables = jax.jit(lambda k, v: m_xla.init(k, v, deterministic=True))(
        jax.random.PRNGKey(0), jnp.asarray(x[:1])
    )
    want = Predictor(m_xla, variables, batch_size=256)(x)
    got = Predictor(m_fused, variables, batch_size=256)(x)
    assert got.shape == (300, 6, 8, 8)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_predictor_rebinds_mesh_for_fused_model():
    """A fused model built without a mesh must not be served GSPMD-style:
    the Pallas custom call is opaque to GSPMD, which would all-gather each
    sharded batch onto every chip. Predictor rebinds its own mesh so the
    kernels shard_map over the data axis."""
    kw = dict(
        image_size=8, spatial_patch_size=1, spectral_patch_size=10, num_classes=6,
        dim=24, depth=2, heads=2, dim_head=8, mlp_dim=16, channels=40,
        spectral_pos=[0, 1, 2, 3],
    )
    m_fused = ViTSpatialSpectral(**kw, fused=True)
    x = np.zeros((1, 40, 8, 8), np.float32)
    variables = jax.jit(lambda k, v: m_fused.init(k, v, deterministic=True))(
        jax.random.PRNGKey(0), jnp.asarray(x)
    )
    pred = Predictor(m_fused, variables, batch_size=8)
    assert pred.mesh.shape["data"] > 1, "test needs the multi-device mesh"
    assert pred.model.mesh is pred.mesh
    # an explicitly meshed (or unfused) model is left untouched
    pre_meshed = m_fused.clone(mesh=pred.mesh)
    assert Predictor(pre_meshed, variables, batch_size=8).model is pre_meshed
    m_xla = ViTSpatialSpectral(**kw, fused=False)
    assert Predictor(m_xla, variables, batch_size=8).model is m_xla


def test_predictor_rebinds_stale_mesh():
    """A fused model bound to a STALE mesh (e.g. the training mesh of a
    finished run, or a multi-chip mesh on a smaller server) must be rebound
    to the serving mesh — and cleared entirely when serving single-chip —
    instead of shard_mapping over devices this runtime doesn't serve with."""
    kw = dict(
        image_size=8, spatial_patch_size=1, spectral_patch_size=10, num_classes=6,
        dim=24, depth=2, heads=2, dim_head=8, mlp_dim=16, channels=40,
        spectral_pos=[0, 1, 2, 3],
    )
    m = ViTSpatialSpectral(**kw, fused=True)
    x = np.zeros((1, 40, 8, 8), np.float32)
    variables = jax.jit(lambda k, v: m.init(k, v, deterministic=True))(
        jax.random.PRNGKey(0), jnp.asarray(x)
    )
    stale = get_mesh(devices=jax.devices()[:4])  # a 4-device "training" mesh
    pre_bound = m.clone(mesh=stale)

    serving = get_mesh()  # all 8 devices
    pred = Predictor(pre_bound, variables, mesh=serving, batch_size=8)
    assert pred.model.mesh is serving

    single = get_mesh(devices=jax.devices()[:1])
    pred1 = Predictor(pre_bound, variables, mesh=single, batch_size=8)
    assert pred1.model.mesh is None  # single-chip: no shard_map at all
    out = pred1(np.zeros((3, 40, 8, 8), np.float32))
    assert out.shape[0] == 3
