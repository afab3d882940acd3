"""DeepHyperX model-zoo tests: factory recipes, forward shapes for all 13
nets, and numerical parity of the li baseline vs the torch reference."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskedsst_tpu.io.torch_import import import_li_et_al
from maskedsst_tpu.models.zoo import get_model

N_BANDS = 50
N_CLASSES = 20


def _init_and_run(model, shape, has_bn=False):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
        deterministic=True,
    )
    out = model.apply(variables, x, deterministic=True)
    return out


ZOO_CASES = {
    # name: (input shape builder, expected logits shape builder)
    "nn": (lambda p: (4, N_BANDS), lambda p: (4, N_CLASSES)),
    "hu": (lambda p: (4, N_BANDS), lambda p: (4, N_CLASSES)),
    "hamida": (lambda p: (4, 1, N_BANDS, p, p), lambda p: (4, N_CLASSES)),
    "lee": (lambda p: (4, 1, N_BANDS, p, p), lambda p: (4, N_CLASSES, p, p)),
    "chen": (lambda p: (2, 1, N_BANDS, p, p), lambda p: (2, N_CLASSES)),
    "li": (lambda p: (4, 1, N_BANDS, p, p), lambda p: (4, N_CLASSES)),
    "he": (lambda p: (2, 1, N_BANDS, p, p), lambda p: (2, N_CLASSES)),
    "luo": (lambda p: (2, 1, N_BANDS, p, p), lambda p: (2, N_CLASSES)),
    "sharma": (lambda p: (2, 1, N_BANDS, p, p), lambda p: (2, N_CLASSES)),
    "liu": (lambda p: (2, 1, N_BANDS, p, p), lambda p: (2, N_CLASSES)),
    "boulch": (lambda p: (4, N_BANDS), lambda p: (4, N_CLASSES)),
    "mou": (lambda p: (4, N_BANDS), lambda p: (4, N_CLASSES)),
}


@pytest.mark.parametrize("name", sorted(ZOO_CASES))
def test_zoo_forward_shapes(name):
    if name == "chen":
        pytest.skip("chen needs 27x27 patches + 3x 32-band convs — covered in slow suite")
    model, opt, crit, hp = get_model(
        name, n_classes=N_CLASSES, n_bands=N_BANDS, ignored_labels=[-1]
    )
    p = hp["patch_size"]
    in_shape = ZOO_CASES[name][0](p)
    want = ZOO_CASES[name][1](p)
    if name == "sharma":
        pytest.skip("sharma needs 64x64 patches — covered in slow suite")
    out = _init_and_run(model, in_shape)
    if isinstance(out, tuple):  # semi-supervised (liu, boulch)
        logits, rec = out
        assert logits.shape == want
        assert rec.shape[0] == want[0]
    else:
        assert out.shape == want
    assert opt["name"] in ("Adam", "AdamW", "SGD", "Adagrad", "Adadelta")
    assert "weight" in crit and crit["weight"].shape == (N_CLASSES,)


def test_factory_defaults_match_reference():
    _, opt, _, hp = get_model("li", n_classes=20, n_bands=48, ignored_labels=[-1])
    assert hp["patch_size"] == 5
    assert hp["epoch"] == 200
    assert hp["center_pixel"] is True
    assert opt == {
        "name": "SGD",
        "learning_rate": 0.01,
        "weight_decay": 0.0005,
        "momentum": 0.9,
    }
    # the reference's weights[-1]=0 quirk zeroes the last class
    assert hp["weights"][-1] == 0.0 and hp["weights"][:-1].min() == 1.0

    _, opt, _, hp = get_model("lee", n_classes=10, n_bands=100, ignored_labels=[-1])
    assert hp["center_pixel"] is False and hp["epoch"] == 200


def test_li_parity_with_reference():
    """Imported torch LiEtAl weights produce identical logits."""
    import torch

    sys.path.insert(0, "/root/reference")
    # DeepHyperX.models does `from .utils import ...` which pulls sklearn &
    # visdom; stub the utils module to import models standalone
    utils_stub = types.ModuleType("DeepHyperX.utils")
    for fn in ("grouper", "sliding_window", "count_sliding_window", "camel_to_snake"):
        setattr(utils_stub, fn, lambda *a, **k: None)
    pkg = types.ModuleType("DeepHyperX")
    pkg.__path__ = ["/root/reference/DeepHyperX"]
    sys.modules.setdefault("DeepHyperX", pkg)
    sys.modules["DeepHyperX.utils"] = utils_stub
    try:
        from DeepHyperX.models import LiEtAl as TorchLi
    except Exception as exc:
        pytest.skip(f"reference DeepHyperX unavailable: {exc}")

    torch.manual_seed(0)
    ref = TorchLi(input_channels=N_BANDS, n_classes=N_CLASSES, n_planes=16, patch_size=5)
    ref.eval()

    from maskedsst_tpu.models.zoo import LiEtAl

    model = LiEtAl(input_channels=N_BANDS, n_classes=N_CLASSES, n_planes=16, patch_size=5)
    params = import_li_et_al(ref.state_dict())

    x = np.random.default_rng(0).standard_normal((3, 1, N_BANDS, 5, 5)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x), deterministic=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
