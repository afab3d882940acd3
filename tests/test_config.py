"""Config-system tests: two-file YAML merge semantics (src/utils.py:316-364),
sweep coercion (:222-273) and spectral-position derivation (:415-429,
src/vit_spatial_spectral.py:767-800)."""

import numpy as np

from maskedsst_tpu.config import (
    Config,
    get_finetune_config,
    get_pretrain_config,
    get_spectral_pos,
    match_wavelengths_to_reference,
    verify_sweep_params,
)
from tests.reference_oracle import load_reference


def test_pretrain_merge():
    cfg = get_pretrain_config("configs/pretrain_config.yaml", "configs/config.yaml", seed=5)
    assert cfg.dataset == "enmap"
    assert cfg.n_bands == 200          # from data section
    assert cfg.transformer_dim == 96   # from transformer section
    assert cfg.mim_masking_ratio == 0.70  # from masked_modeling section
    assert cfg.lr == 0.008
    assert cfg.seed == 5
    # mutability (trainers attach run_id etc.)
    cfg.run_id = "abc"
    assert cfg.run_id == "abc"


def test_finetune_derivations_enmap():
    cfg = get_finetune_config("configs/finetune_config_enmap.yaml", "configs/config.yaml")
    assert cfg.dataset == "dfc"
    assert cfg.spectral_pos == list(range(20))
    assert cfg.patch_sub == 0  # not pixelwise


def test_finetune_patch_sub_pixelwise():
    import tempfile, yaml, os

    with open("configs/finetune_config_enmap.yaml") as f:
        raw = yaml.safe_load(f)
    raw["pixelwise"] = True
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        yaml.safe_dump(raw, f)
        path = f.name
    try:
        cfg = get_finetune_config(path, "configs/config.yaml")
        assert cfg.patch_sub == 1  # even image size needs a center pixel
    finally:
        os.unlink(path)


def test_houston_spectral_pos_matches_reference():
    """Wavelength matching of Houston blocks onto EnMAP blocks equals the
    reference implementation."""
    _, ref_vss, _, _ = load_reference()
    from maskedsst_tpu.data.constants import (
        ENMAP_INVALID_L2_BANDS,
        ENMAP_WAVELENGTHS,
        HOUSTON2018_WAVELENGTHS,
    )

    valid = np.asarray(ENMAP_WAVELENGTHS)[~np.asarray(ENMAP_INVALID_L2_BANDS)]
    ours = get_spectral_pos("houston2018", 50, 10)
    theirs = ref_vss.get_pos_for_spectral_embedding(10, HOUSTON2018_WAVELENGTHS, valid)
    assert ours == [int(t) for t in theirs]
    assert len(ours) == 5  # 48 bands → 5 blocks of 10 (last partial)


def test_match_wavelengths_partial_tail():
    # 7 bands, depth 3 → 3 query blocks with means [2, 11, 20]; the reference
    # wavelengths are blocked too: [1,2,3]→2, [10,11,12]→11, [20,30]→25
    out = match_wavelengths_to_reference(
        3, [1, 2, 3, 10, 11, 12, 20], [1, 2, 3, 10, 11, 12, 20, 30]
    )
    assert out == [0, 1, 2]


def test_verify_sweep_params():
    coerced = verify_sweep_params(
        {
            "checkpoint_path": "none",
            "linear_eval": "false",
            "spectral_pos_embed": "False",
            "blockwise_patch_embed": True,
            "spectral_only": None,
            "pixelwise": "true",
            "shifting_window": False,
            "overwrite_li_optim": "False",
        }
    )
    assert coerced == {
        "checkpoint_path": None,
        "linear_eval": False,
        "spectral_pos_embed": False,
        "blockwise_patch_embed": True,
        "spectral_only": False,
        "pixelwise": True,
        "shifting_window": False,
        "overwrite_li_optim": False,
    }


def test_config_object():
    c = Config({"a": 1}, b=2)
    assert c.a == 1 and c.b == 2
    assert c.get("missing") is None
    assert "a" in c
    d = c.copy()
    d.a = 9
    assert c.a == 1


def test_rederive_finetune_config_after_overrides():
    """Sweep/CLI overrides of band_patch_size (or pixelwise) must refresh
    the DERIVED fields, like the reference's post-wandb.config re-derivation
    (src/utils.py:381-388)."""
    from maskedsst_tpu.config import get_finetune_config, rederive_finetune_config

    cfg = get_finetune_config(
        "configs/finetune_config_enmap.yaml", "configs/config.yaml"
    )
    old_len = len(cfg.spectral_pos)
    cfg.band_patch_size = cfg.band_patch_size * 2
    rederive_finetune_config(cfg)
    assert len(cfg.spectral_pos) == cfg.n_bands // cfg.band_patch_size != old_len

    cfg.pixelwise = True
    rederive_finetune_config(cfg)
    assert cfg.patch_sub == (1 if cfg.image_size % 2 == 0 else 0)


def test_relative_config_paths_resolve_from_any_cwd(tmp_path, monkeypatch):
    """The drivers' "configs/..." defaults must work when the CLI is invoked
    outside the repo root (cwd-relative first, repo-root fallback)."""
    from maskedsst_tpu.config import get_finetune_config

    monkeypatch.chdir(tmp_path)
    cfg = get_finetune_config(
        "configs/finetune_config_enmap.yaml", "configs/config.yaml"
    )
    assert cfg.dataset == "dfc"  # finetune_config_enmap.yaml targets EnMAP-DFC

    # cwd-local file still wins over the repo-root copy
    (tmp_path / "configs").mkdir()
    (tmp_path / "configs" / "probe.yaml").write_text("marker: 7\n")
    from maskedsst_tpu.config import _load_yaml

    assert _load_yaml("configs/probe.yaml") == {"marker": 7}
