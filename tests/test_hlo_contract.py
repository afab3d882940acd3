"""Compile-time collective contract for the fused multi-chip path.

The fused Pallas kernels are opaque to GSPMD, so they shard over the data
axis only via explicit ``jax.shard_map`` (models/layers.py) — and when the
plumbing breaks (batch not divisible, mesh not threaded), the path silently
falls back to GSPMD, which ALL-GATHERS the batch-sized kernel operands onto
every chip (parallel.mesh.data_axis_or_warn documents the cliff). On real
multi-chip hardware that is a silent slowdown; this environment has one
chip, so timing can never catch it. These tests pin the contract at the HLO
level instead: the optimized module of the fused 8-device train step must
contain gradient all-reduces and NO batch-sized all-gather. A built-in
mutation leg (data_axis_or_warn forced to 1) proves the detector goes red
when the shard_map plumbing is broken.

Reference scope: the single-device step being scaled is
/root/reference/pretrain.py:28 and src/utils.py:608-663 (SURVEY.md §5.8).
"""

import re
import warnings
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import maskedsst_tpu.parallel.mesh as pmesh
from maskedsst_tpu.config import get_finetune_config, get_pretrain_config
from maskedsst_tpu.parallel.mesh import batch_sharding, get_mesh

N_DEV = 8

_OPS = "all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all"
# single-array result:  foo = f32[16,4,64]{...} all-gather(...)
_COLLECTIVE = re.compile(rf"=\s*(\w+)\[([\d,]*)\][^\s]*\s+({_OPS})\(")
# tuple result:  foo = (f32[..]{{..}}, f32[..]{{..}}) all-gather(...)
# (combined/multi-operand collectives — some XLA versions emit these)
_COLLECTIVE_TUPLE = re.compile(rf"=\s*\(([^)]*)\)\s+({_OPS})\(")
_ARRAY = re.compile(r"(\w+)\[([\d,]*)\]")


def _elems(shape: str) -> int:
    return int(np.prod([int(d) for d in shape.split(",")])) if shape else 1


def collectives(compiled_text: str):
    """[(op, dtype, n_elements)] for every collective result array in an
    optimized HLO module text — one entry per array of a tuple-typed
    (combined) collective."""
    out = []
    for m in _COLLECTIVE.finditer(compiled_text):
        dtype, shape, op = m.groups()
        out.append((op, dtype, _elems(shape)))
    for m in _COLLECTIVE_TUPLE.finditer(compiled_text):
        arrays, op = m.groups()
        for dtype, shape in _ARRAY.findall(arrays):
            out.append((op, dtype, _elems(shape)))
    return out


def assert_contract(text: str, *, batch_elems: int, what: str):
    """The fused-DP contract: >=1 all-reduce (the gradient psum over ICI),
    and no all-gather/all-to-all of a batch-sized operand. ``batch_elems``
    is the element count above which a gathered operand counts as
    batch-sized (set well below the smallest batch tensor but above any
    conceivable metrics/scalar traffic)."""
    colls = collectives(text)
    ops = Counter(op for op, _, _ in colls)
    assert ops.get("all-reduce", 0) >= 1, (what, colls)
    gathered = [
        (op, dt, n)
        for op, dt, n in colls
        if op in ("all-gather", "all-to-all") and n >= batch_elems
    ]
    assert not gathered, (
        f"{what}: batch-sized reshard collectives in the optimized HLO — the "
        f"fused path fell back to GSPMD: {gathered}"
    )


def _tiny(config):
    config.n_bands = 40
    config.transformer_dim = 24
    config.transformer_depth = 2
    config.transformer_n_heads = 2
    config.transformer_mlp_dim = 16
    config.batch_size = 2 * N_DEV
    config.fused = True
    # in-kernel dropout PRNG has no CPU-interpret lowering; the collective
    # structure under test is dropout-independent
    config.transformer_dropout = 0.0
    config.transformer_emb_dropout = 0.0
    return config


def _mesh():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"needs {N_DEV} devices")
    return get_mesh(jax.devices()[:N_DEV], model_axis=1)


def _pretrain_text(mesh, broken: bool) -> str:
    from maskedsst_tpu.train.pretrainer import Pretrainer

    config = _tiny(
        get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    )
    orig = pmesh.data_axis_or_warn
    if broken:
        pmesh.data_axis_or_warn = lambda *a, **k: 1
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            tr = Pretrainer(config, mesh=mesh)
        tiles = jax.ShapeDtypeStruct(
            (config.batch_size, config.n_bands, 64, 64),
            jnp.float32,
            sharding=batch_sharding(mesh),
        )
        return tr._train_step.lower(tr.state, tiles).compile().as_text()
    finally:
        pmesh.data_axis_or_warn = orig


def _finetune_text(mesh, broken: bool) -> str:
    from maskedsst_tpu.train.factory import build_finetune_model
    from maskedsst_tpu.train.finetuner import Finetuner

    config = _tiny(
        get_finetune_config(
            "configs/finetune_config_enmap.yaml", "configs/config.yaml"
        )
    )
    config.spectral_pos = config.spectral_pos[:4]  # 40 bands -> 4 blocks
    orig = pmesh.data_axis_or_warn
    if broken:
        pmesh.data_axis_or_warn = lambda *a, **k: 1
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            model, kwargs = build_finetune_model(config, mesh=mesh)
            tr = Finetuner(config, model, mesh=mesh, **kwargs)
        tiles = jax.ShapeDtypeStruct(
            (config.batch_size, config.n_bands, 64, 64),
            jnp.float32,
            sharding=batch_sharding(mesh),
        )
        labels = jax.ShapeDtypeStruct(
            (config.batch_size, 64, 64), jnp.int32, sharding=batch_sharding(mesh)
        )
        return tr._train_step.lower(tr.state, tiles, labels).compile().as_text()
    finally:
        pmesh.data_axis_or_warn = orig


def test_collective_matcher_handles_tuple_typed_ops():
    """Combined collectives come back tuple-typed; the detector must count
    every array of the tuple (a batch-sized all-gather hidden in a tuple
    must not pass vacuously)."""
    text = (
        "  %ar = f32[128,4,24]{2,1,0} all-reduce(f32[128,4,24] %g), ...\n"
        "  %agt = (f32[16,4,64]{2,1,0}, f32[1024,4,24]{2,1,0}) "
        "all-gather(f32[2,4,64] %a, f32[128,4,24] %b), ...\n"
    )
    got = collectives(text)
    assert ("all-reduce", "f32", 128 * 4 * 24) in got
    assert ("all-gather", "f32", 16 * 4 * 64) in got
    assert ("all-gather", "f32", 1024 * 4 * 24) in got
    with pytest.raises(AssertionError):
        assert_contract(text, batch_elems=1024, what="tuple smoke")


def test_fused_pretrain_step_collective_contract():
    mesh = _mesh()
    text = _pretrain_text(mesh, broken=False)
    # threshold: the smallest batch-shaped fused operand is the token slab
    # [B*blocks, seq, dim] >> 1024; gradient all-reduces are param-shaped
    # and exempt by op kind, scalars/metrics are far below the threshold
    assert_contract(text, batch_elems=1024, what="fused pretrain step")


def test_fused_pretrain_superstep_collective_contract():
    """The PRODUCTION dispatch is the superstep (lax.scan of K steps over
    HBM-resident tiles, _train_superstep) — the contract must hold inside
    the scanned body too, where the store gather/crop adds its own
    sharding seams."""
    from maskedsst_tpu.train.pretrainer import Pretrainer

    config = _tiny(
        get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    )
    config.steps_per_call = 2
    mesh = _mesh()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tr = Pretrainer(config, mesh=mesh)
    tiles = jax.ShapeDtypeStruct((32, config.n_bands, 64, 64), jnp.float32)
    idx = jax.ShapeDtypeStruct((2, config.batch_size), jnp.int32)
    text = (
        tr._train_superstep.lower(tr.state, tiles, idx).compile().as_text()
    )
    assert_contract(text, batch_elems=1024, what="fused pretrain superstep")


def test_fused_pretrain_step_mutation_detected():
    """Detector-has-teeth leg: with data_axis_or_warn forced to 1 (the
    GSPMD-fallback mutation), the optimized HLO must contain batch-sized
    all-gathers — i.e. assert_contract goes red."""
    mesh = _mesh()
    text = _pretrain_text(mesh, broken=True)
    with pytest.raises(AssertionError):
        assert_contract(text, batch_elems=1024, what="mutated pretrain step")


def test_fused_finetune_step_collective_contract():
    mesh = _mesh()
    text = _finetune_text(mesh, broken=False)
    assert_contract(text, batch_elems=1024, what="fused finetune step")


def test_fused_finetune_step_mutation_detected():
    mesh = _mesh()
    text = _finetune_text(mesh, broken=True)
    with pytest.raises(AssertionError):
        assert_contract(text, batch_elems=1024, what="mutated finetune step")


def _serving_text(mesh, broken: bool) -> str:
    from maskedsst_tpu.serve import Predictor
    from maskedsst_tpu.train.pretrainer import build_pretrain_model

    config = _tiny(
        get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml")
    )
    # the encoder exactly as the production builder threads it (fused +
    # mesh gating included) — a hand-built copy here would drift when the
    # builder gains kwargs
    model = build_pretrain_model(config, mesh=mesh).encoder
    import functools

    x = jnp.zeros((config.batch_size, config.n_bands, 8, 8), jnp.float32)
    variables = jax.jit(functools.partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), x
    )
    orig = pmesh.data_axis_or_warn
    if broken:
        pmesh.data_axis_or_warn = lambda *a, **k: 1
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            pred = Predictor(
                model, variables, mesh=mesh, batch_size=config.batch_size
            )
        shape = jax.ShapeDtypeStruct(
            x.shape, jnp.float32, sharding=batch_sharding(mesh)
        )
        return pred._fwd.lower(pred.variables, shape).compile().as_text()
    finally:
        pmesh.data_axis_or_warn = orig


def test_fused_serving_forward_collective_contract():
    """Inference with replicated params and a batch-sharded input needs NO
    collectives at all — any batch-sized all-gather means the fused serving
    path (scripts/serving_bench workload, serve.Predictor) fell to GSPMD."""
    mesh = _mesh()
    text = _serving_text(mesh, broken=False)
    colls = collectives(text)
    gathered = [
        (op, dt, n)
        for op, dt, n in colls
        if op in ("all-gather", "all-to-all") and n >= 1024
    ]
    assert not gathered, gathered


def test_fused_serving_forward_mutation_detected():
    mesh = _mesh()
    text = _serving_text(mesh, broken=True)
    gathered = [
        (op, dt, n)
        for op, dt, n in collectives(text)
        if op in ("all-gather", "all-to-all") and n >= 1024
    ]
    assert gathered, "mutated serving forward shows no batch all-gather"
