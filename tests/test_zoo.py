"""DeepHyperX model-zoo tests: factory recipes, forward shapes for all 12
nets, and numerical parity of the li baseline vs the torch reference."""

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
        pytest.skip("chen needs 27x27 patches + >=94 bands; covered by test_zoo_parity_with_reference[chen] at real geometry")
    model, opt, crit, hp = get_model(
        name, n_classes=N_CLASSES, n_bands=N_BANDS, ignored_labels=[-1]
    )
    p = hp["patch_size"]
    in_shape = ZOO_CASES[name][0](p)
    want = ZOO_CASES[name][1](p)
    if name == "sharma":
        pytest.skip("sharma needs 64x64 patches; covered by test_zoo_parity_with_reference[sharma] at real geometry")
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

    from .reference_oracle import load_reference_hyperx

    TorchLi = load_reference_hyperx().LiEtAl

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


# --- full-zoo oracle parity ---------------------------------------------------

# name → (reference ctor args beyond (bands, classes), n_bands, input kind)
PARITY_CASES = {
    "nn": ({}, 50, "flat"),
    "hu": ({}, 50, "flat"),
    "hamida": ({"patch_size": 5}, 50, "cube5d"),
    "lee": ({}, 50, "cube5d"),
    "chen": ({"patch_size": 27, "n_planes": 32}, 100, "cube5d"),
    "li": ({"n_planes": 16, "patch_size": 5}, 50, "cube5d"),
    "he": ({"patch_size": 7}, 50, "cube5d"),
    "luo": ({"patch_size": 3, "n_planes": 90}, 50, "cube5d"),
    "sharma": ({"patch_size": 64}, 50, "cube5d"),
    "liu": ({"patch_size": 9}, 50, "cube4d"),
    "boulch": ({"planes": 16}, 50, "flat"),
    "mou": ({}, 50, "flat"),
}

REF_CLASS = {
    "nn": "Baseline",
    "hu": "HuEtAl",
    "hamida": "HamidaEtAl",
    "lee": "LeeEtAl",
    "chen": "ChenEtAl",
    "li": "LiEtAl",
    "he": "HeEtAl",
    "luo": "LuoEtAl",
    "sharma": "SharmaEtAl",
    "liu": "LiuEtAl",
    "boulch": "BoulchEtAl",
    "mou": "MouEtAl",
}


@pytest.mark.parametrize("name", sorted(PARITY_CASES))
def test_zoo_parity_with_reference(name):
    """Every zoo net reproduces the reference's logits with imported weights.

    Oracle: the upstream torch classes (DeepHyperX/models.py:205-996), eval
    mode. BatchNorm nets first take a few training-mode steps so the running
    statistics are non-trivial before comparison.
    """
    import torch

    from maskedsst_tpu.io.torch_import import import_zoo

    from .reference_oracle import load_reference_hyperx

    ref_models = load_reference_hyperx()
    ctor_kwargs, bands, kind = PARITY_CASES[name]

    torch.manual_seed(0)
    ref = getattr(ref_models, REF_CLASS[name])(bands, N_CLASSES, **ctor_kwargs)

    model, _, _, hp = get_model(
        name, n_classes=N_CLASSES, n_bands=bands, ignored_labels=[-1],
        **({"patch_size": ctor_kwargs["patch_size"]} if "patch_size" in ctor_kwargs else {}),
    )
    p = hp["patch_size"]
    rng = np.random.default_rng(7)
    if kind == "flat":
        shape = (3, bands)
    elif kind == "cube4d":
        shape = (3, bands, p, p)
    else:
        shape = (3, 1, bands, p, p)
    x = rng.standard_normal(shape).astype(np.float32)

    # make BatchNorm running stats non-trivial, then freeze
    if any("running_mean" in k for k in ref.state_dict()):
        ref.train()
        with torch.no_grad():
            for _ in range(3):
                ref(torch.from_numpy(x + rng.standard_normal(shape).astype(np.float32)))
    ref.eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x),
        deterministic=True,
    )
    variables = import_zoo(ref.state_dict(), variables)
    got = model.apply(variables, jnp.asarray(x), deterministic=True)

    if isinstance(want, tuple):  # semi-supervised: (logits, reconstruction)
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), w.numpy(), rtol=1e-3, atol=5e-4
            )
    else:
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), rtol=1e-3, atol=5e-4
        )
