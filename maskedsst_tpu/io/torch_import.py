"""PyTorch ``.pth`` checkpoint import → flax parameter pytrees.

The reference ships pre-trained checkpoints saved with ``torch.save`` of
``{"model_state_dict": ...}`` dicts (pretrain.py:136-148, src/utils.py:584-604).
This module maps those state dicts onto the parameter layout of
maskedsst_tpu's models so imported logits match the reference to float
precision (BASELINE.md parity target <1e-3).

Key structural translations:

* torch ``nn.Linear`` weight [out, in] → flax kernel [in, out] (transpose);
* torch ``nn.LayerNorm`` weight/bias → flax scale/bias;
* the reference's ``num_blocks`` separate blockwise-embedding Linears
  (``to_patch_embedding.blockwise_embed.{i}``) stack into one
  ``[blocks, patch_dim, dim]`` kernel + ``[blocks, dim]`` bias;
* the per-block SimMIM decoders (``to_pixels.layers.{i}``) stack likewise;
* ``spatial_spectral_transformer`` is a torch ``nn.Sequential`` whose
  transformer stacks sit at index 1 (spatial) and 3 (spectral) — index 1 only
  for ``spectral_only`` (src/vit_spatial_spectral.py:393-431).

``load_pretrained_encoder`` replicates the finetune-time key surgery of the
reference ``load_checkpoint`` (src/utils.py:276-313): strip the ``encoder.``
prefix SimMIM adds, drop the pre-training-era classifier head in favor of the
freshly initialized one, and truncate ``pos_embed`` rows when finetuning at a
smaller image size (``patch_sub``).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor (or array) → owned numpy array.

    Copies: ``.numpy()`` aliases the torch storage, so an in-place torch
    mutation after import (e.g. ``optimizer.step()`` in a parity harness)
    would silently rewrite the imported tree."""
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy().copy()
    return np.asarray(t)


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _transformer(sd: Mapping[str, Any], prefix: str, depth: int) -> Dict[str, Any]:
    """lucidrains Transformer (src/vit_spatial_spectral.py:81-104) → our
    Transformer param tree (layers_{i}/{attn_norm, attn, ff_norm, ff})."""
    out: Dict[str, Any] = {}
    for i in range(depth):
        base = f"{prefix}.layers.{i}"
        layer = {
            "attn_norm": _layernorm(sd, f"{base}.0.norm"),
            "attn": {
                "to_qkv": {"kernel": _np(sd[f"{base}.0.fn.to_qkv.weight"]).T},
            },
            "ff_norm": _layernorm(sd, f"{base}.1.norm"),
            "ff": {
                "fc1": _linear(sd, f"{base}.1.fn.net.0"),
                "fc2": _linear(sd, f"{base}.1.fn.net.3"),
            },
        }
        if f"{base}.0.fn.to_out.0.weight" in sd:
            layer["attn"]["to_out"] = _linear(sd, f"{base}.0.fn.to_out.0")
        out[f"layers_{i}"] = layer
    return out


def _stack_blockwise(sd: Mapping[str, Any], prefix: str, num_blocks: int) -> Dict[str, np.ndarray]:
    """Stack ``{prefix}.{i}.weight/bias`` Linears → kernel [g, in, out], bias [g, out]."""
    kernels = [_np(sd[f"{prefix}.{i}.weight"]).T for i in range(num_blocks)]
    biases = [_np(sd[f"{prefix}.{i}.bias"]) for i in range(num_blocks)]
    return {"kernel": np.stack(kernels, 0), "bias": np.stack(biases, 0)}


def import_vit_spatial_spectral(sd: Mapping[str, Any], model) -> Dict[str, Any]:
    """Reference ViTSpatialSpectral state dict → flax params for
    :class:`maskedsst_tpu.models.ViTSpatialSpectral` (same config)."""
    params: Dict[str, Any] = {}

    if model.blockwise_patch_embed:
        stacked = _stack_blockwise(
            sd, "to_patch_embedding.blockwise_embed", model.num_spectral_patches
        )
        params["to_patch_embedding"] = {
            "pre_norm": _layernorm(sd, "to_patch_embedding.pre_norm"),
            "post_norm": _layernorm(sd, "to_patch_embedding.post_norm"),
            "blockwise_kernel": stacked["kernel"],
            "blockwise_bias": stacked["bias"],
        }
    else:
        # reference PatchEmbed: to_patch = Sequential(Rearrange, LN) with the
        # LN at index 1; embed = Sequential(Linear, LN) (indices 0, 1)
        params["to_patch_embedding"] = {
            "pre_norm": _layernorm(sd, "to_patch_embedding.to_patch.1"),
            "proj": _linear(sd, "to_patch_embedding.embed.0"),
            "post_norm": _layernorm(sd, "to_patch_embedding.embed.1"),
        }

    if model.spectral_pos_embed:
        params["pos_embed"] = _np(sd["pos_embed"])
        params["channel_embed"] = _np(sd["channel_embed"])
    else:
        params["pos_embedding"] = _np(sd["pos_embedding"])

    if model.spectral_only:
        params["spectral_transformer"] = _transformer(
            sd, "spatial_spectral_transformer.1", model.depth
        )
    else:
        params["spatial_transformer"] = _transformer(
            sd, "spatial_spectral_transformer.1", model.depth
        )
        params["spectral_transformer"] = _transformer(
            sd, "spatial_spectral_transformer.3", model.depth
        )

    # heads: Sequential(LN, Linear, ...) — Linear at index 2 when pixelwise
    # (a Flatten sits at index 1), else index 1 (reference :437-493). Source
    # checkpoints from (non-pixelwise) pre-training keep theirs at index 1.
    if "mlp_head.0.weight" in sd:
        params["head_norm"] = _layernorm(sd, "mlp_head.0")
    for linear_idx in ((2, 1) if model.pixelwise else (1,)):
        if f"mlp_head.{linear_idx}.weight" in sd:
            params["head_linear"] = _linear(sd, f"mlp_head.{linear_idx}")
            break
    else:
        if any(k.startswith("mlp_head.") for k in sd):
            # an mlp_head exists but its Linear sits at an unexpected index:
            # silently omitting head_linear would only surface as a flax
            # missing-param error far from the import site
            import warnings

            head_keys = sorted(k for k in sd if k.startswith("mlp_head."))
            warnings.warn(
                f"checkpoint has an mlp_head ({head_keys}) but no Linear at "
                "the expected indices; head_linear was NOT imported",
                stacklevel=2,
            )
    return params


def import_simmim(sd: Mapping[str, Any], simmim) -> Dict[str, Any]:
    """Reference SimMIMSpatialSpectral state dict (keys prefixed ``encoder.``)
    → flax params for :class:`maskedsst_tpu.models.SimMIMSpatialSpectral`."""
    enc_sd = {
        k[len("encoder.") :]: v for k, v in sd.items() if k.startswith("encoder.")
    }
    params: Dict[str, Any] = {
        "encoder": import_vit_spatial_spectral(enc_sd, simmim.encoder),
        "mask_token": _np(sd["mask_token"]),
    }
    if simmim.to_pixels_per_spectral_block:
        stacked = _stack_blockwise(
            sd, "to_pixels.layers", simmim.encoder.num_spectral_patches
        )
        params["to_pixels"] = stacked
    else:
        params["to_pixels_linear"] = _linear(sd, "to_pixels")
    return params


def import_vit_rgb(sd: Mapping[str, Any], model) -> Dict[str, Any]:
    """Reference ViTRGB state dict (src/vit_original.py:103-202) → flax params."""
    params: Dict[str, Any] = {
        "patch_chain": {
            "patch_pre_norm": _layernorm(sd, "to_patch_embedding.1"),
            "patch_proj": _linear(sd, "to_patch_embedding.2"),
            "patch_post_norm": _layernorm(sd, "to_patch_embedding.3"),
        },
        "pos_embedding": _np(sd["pos_embedding"]),
        "cls_token": _np(sd["cls_token"]),
        "transformer": _transformer(sd, "transformer", model.depth),
        "head_norm": _layernorm(sd, "mlp_head.0"),
        "head_linear": _linear(sd, "mlp_head.1"),
    }
    return params


def import_vit_spatial_spectral_v1(sd: Mapping[str, Any], model) -> Dict[str, Any]:
    """Reference ViTSpatialSpectral_V1 state dict
    (src/vit_spatial_spectral.py:600-764) → flax params."""
    return {
        "embed_chain": {
            "pre_norm": _layernorm(sd, "to_patch_embedding.1"),
            "proj": _linear(sd, "to_patch_embedding.2"),
            "post_norm": _layernorm(sd, "to_patch_embedding.3"),
        },
        "pos_embedding": _np(sd["pos_embedding"]),
        "spatial_transformer": _transformer(sd, "spatial_spectral_transformer.1", model.depth),
        "spectral_transformer": _transformer(sd, "spatial_spectral_transformer.3", model.depth),
        "head_norm": _layernorm(sd, "mlp_head.0"),
        "head_linear": _linear(sd, "mlp_head.1"),
    }


def load_pretrained_encoder(
    checkpoint: Mapping[str, Any],
    model,
    fresh_params: Dict[str, Any],
    patch_sub: int = 0,
) -> Dict[str, Any]:
    """Finetune-time import of a pre-training checkpoint with the reference's
    key surgery (src/utils.py:276-313).

    Args:
      checkpoint: the loaded ``.pth`` dict (must contain ``model_state_dict``
        with ``encoder.``-prefixed keys from the SimMIM wrapper).
      model: the target ViTSpatialSpectral (finetune config).
      fresh_params: freshly initialized params of ``model``; supplies the new
        classification head (the pre-trained reconstruction-era head is
        discarded, exactly like the reference deletes ``mlp_head.1`` and
        re-installs the fresh weights).
      patch_sub: rows to truncate from ``pos_embed`` when finetuning at
        ``image_size - patch_sub``.

    Returns:
      params with pre-trained encoder weights and the fresh head.
    """
    sd = checkpoint["model_state_dict"]
    enc_sd = {k[len("encoder.") :]: v for k, v in sd.items() if k.startswith("encoder.")}
    params = import_vit_spatial_spectral(enc_sd, model)

    if patch_sub != 0 and "pos_embed" in params:
        want = model.num_spatial_patches
        params["pos_embed"] = params["pos_embed"][:, :want, :]

    # the pre-trained head Linear predicted reconstruction-era classes — use
    # the freshly initialized one instead (reference deletes mlp_head.1.* and
    # re-keys the fresh head at linear_idx 1 or 2). The head LayerNorm
    # (mlp_head.0) is NOT swapped — it loads from the checkpoint, exactly as
    # the reference's load_state_dict keeps it.
    params["head_linear"] = fresh_params["head_linear"]
    return params


def _conv3d(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Conv3d kernel [out, in, k0, k1, k2] → flax [k0, k1, k2, in, out]."""
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def import_li_et_al(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference LiEtAl state dict (DeepHyperX/models.py:532-586) → flax
    params for maskedsst_tpu.models.zoo.LiEtAl. The fc weights transfer
    directly because the flax model flattens features in torch order."""
    return {
        "conv1": _conv3d(sd, "conv1"),
        "conv2": _conv3d(sd, "conv2"),
        "fc": _linear(sd, "fc"),
    }


def import_zoo(sd: Mapping[str, Any], variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Generic DeepHyperX zoo importer: torch ``state_dict`` → flax variables.

    Works for every net in maskedsst_tpu.models.zoo because those modules
    carry the reference's attribute names (torch '.'-paths map to flax names
    with '.' → '_', e.g. ``encoder.0`` → ``encoder_0``; see
    DeepHyperX/models.py:205-996 for the reference definitions). Handles
    Linear / Conv1-3d / BatchNorm / GRU tensors; state-dict entries with no
    flax counterpart are skipped (e.g. LiuEtAl's registered-but-unused
    ``fc1_dec_bn``, DeepHyperX/models.py:855). ``variables`` is the tree from
    ``model.init`` and supplies the target structure; every imported leaf is
    shape-checked against it.
    """
    params = jax.tree_util.tree_map(lambda x: x, dict(variables["params"]))
    batch_stats = (
        jax.tree_util.tree_map(lambda x: x, dict(variables["batch_stats"]))
        if "batch_stats" in variables
        else None
    )

    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for key, tensor in sd.items():
        prefix, leaf = key.rsplit(".", 1)
        if leaf == "num_batches_tracked":
            continue
        groups.setdefault(prefix, {})[leaf] = _np(tensor)

    def _conv_kernel(w: np.ndarray) -> np.ndarray:
        # torch [out, in, *k] → flax [*k, in, out]
        return np.transpose(w, (*range(2, w.ndim), 1, 0))

    def _descend(tree):
        # unwrap Conv3d/Conv2d wrapper modules ({"Conv_0": {...}})
        while "kernel" not in tree and "scale" not in tree and len(tree) == 1:
            (inner,) = tree.keys()
            tree = tree[inner]
        return tree

    def _assign(target, new: Dict[str, np.ndarray], where: str) -> None:
        for name, value in new.items():
            assert name in target, f"{where}: no target leaf {name}"
            got, want = value.shape, target[name].shape
            assert got == want, f"{where}.{name}: shape {got} != {want}"
            target[name] = jnp.asarray(value, target[name].dtype)

    # modules the reference registers but never uses in forward — the only
    # groups allowed to miss a flax counterpart (LiuEtAl.fc1_dec_bn,
    # DeepHyperX/models.py:855 vs :869)
    known_unused = {"fc1_dec_bn"}
    for prefix, tensors in groups.items():
        flax_name = prefix.replace(".", "_")
        if flax_name not in params:
            assert prefix in known_unused, (
                f"state-dict group {prefix!r} has no flax module {flax_name!r}; "
                "refusing to silently drop weights"
            )
            continue
        if "weight_ih_l0" in tensors:  # torch nn.GRU, single layer
            extra = set(tensors) - {
                "weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"
            }
            assert not extra, (
                f"{prefix}: GRU has tensors beyond the single-layer "
                f"unidirectional set ({sorted(extra)}) — multi-layer/"
                "bidirectional GRUs are not representable here; refusing to "
                "silently drop recurrent weights"
            )
            _assign(
                params[flax_name],
                {
                    "weight_ih": tensors["weight_ih_l0"].T,
                    "weight_hh": tensors["weight_hh_l0"].T,
                    "bias_ih": tensors["bias_ih_l0"],
                    "bias_hh": tensors["bias_hh_l0"],
                },
                prefix,
            )
        elif "running_mean" in tensors:  # BatchNorm
            _assign(
                params[flax_name],
                {"scale": tensors["weight"], "bias": tensors["bias"]},
                prefix,
            )
            assert batch_stats is not None, f"{prefix}: BN import needs batch_stats"
            _assign(
                batch_stats[flax_name],
                {"mean": tensors["running_mean"], "var": tensors["running_var"]},
                prefix,
            )
        else:
            w = tensors["weight"]
            new = {"kernel": w.T if w.ndim == 2 else _conv_kernel(w)}
            if "bias" in tensors:
                new["bias"] = tensors["bias"]
            _assign(_descend(params[flax_name]), new, prefix)

    out: Dict[str, Any] = {"params": params}
    if batch_stats is not None:
        out["batch_stats"] = batch_stats
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a ``.pth`` file into plain numpy-backed dicts (torch CPU).

    Tries the pickle-restricted ``weights_only=True`` first (tensor/dict
    payloads — everything this framework exports); reference-era blobs
    whose ``config`` entry pickles a custom Dotdict need the unrestricted
    loader, which executes arbitrary pickle bytecode — fall back only with
    a loud warning so loading an untrusted file is a conscious act."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        import warnings

        warnings.warn(
            f"{path}: not loadable under weights_only=True (non-tensor "
            "pickled objects, e.g. the reference's Dotdict config); falling "
            "back to the UNRESTRICTED pickle loader — only do this for "
            "checkpoints from a trusted source",
            stacklevel=2,
        )
        return torch.load(path, map_location="cpu", weights_only=False)


# --- export (inverse importer): flax params → reference state-dict keys -----

def _export_linear(tree, prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.weight"] = np.asarray(tree["kernel"]).T
    if "bias" in tree:
        out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def _export_layernorm(tree, prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.weight"] = np.asarray(tree["scale"])
    out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def _export_transformer(tree, prefix: str, depth: int, out: Dict[str, np.ndarray]) -> None:
    for i in range(depth):
        layer = tree[f"layers_{i}"]
        base = f"{prefix}.layers.{i}"
        _export_layernorm(layer["attn_norm"], f"{base}.0.norm", out)
        out[f"{base}.0.fn.to_qkv.weight"] = np.asarray(layer["attn"]["to_qkv"]["kernel"]).T
        if "to_out" in layer["attn"]:
            _export_linear(layer["attn"]["to_out"], f"{base}.0.fn.to_out.0", out)
        _export_layernorm(layer["ff_norm"], f"{base}.1.norm", out)
        _export_linear(layer["ff"]["fc1"], f"{base}.1.fn.net.0", out)
        _export_linear(layer["ff"]["fc2"], f"{base}.1.fn.net.3", out)


def export_vit_spatial_spectral(params: Mapping[str, Any], model) -> Dict[str, np.ndarray]:
    """flax ViTSpatialSpectral params → a reference-keyed state dict (numpy
    values; feed through ``torch.save({'model_state_dict': ...})`` after
    tensor-ifying for full interop). Exact inverse of
    :func:`import_vit_spatial_spectral`."""
    out: Dict[str, np.ndarray] = {}
    if model.blockwise_patch_embed:
        _export_layernorm(params["to_patch_embedding"]["pre_norm"], "to_patch_embedding.pre_norm", out)
        _export_layernorm(params["to_patch_embedding"]["post_norm"], "to_patch_embedding.post_norm", out)
        kernel = np.asarray(params["to_patch_embedding"]["blockwise_kernel"])
        bias = np.asarray(params["to_patch_embedding"]["blockwise_bias"])
        for i in range(kernel.shape[0]):
            out[f"to_patch_embedding.blockwise_embed.{i}.weight"] = kernel[i].T
            out[f"to_patch_embedding.blockwise_embed.{i}.bias"] = bias[i]
    else:
        _export_layernorm(params["to_patch_embedding"]["pre_norm"], "to_patch_embedding.to_patch.1", out)
        _export_linear(params["to_patch_embedding"]["proj"], "to_patch_embedding.embed.0", out)
        _export_layernorm(params["to_patch_embedding"]["post_norm"], "to_patch_embedding.embed.1", out)

    if model.spectral_pos_embed:
        out["pos_embed"] = np.asarray(params["pos_embed"])
        out["channel_embed"] = np.asarray(params["channel_embed"])
    else:
        out["pos_embedding"] = np.asarray(params["pos_embedding"])

    if model.spectral_only:
        _export_transformer(params["spectral_transformer"], "spatial_spectral_transformer.1", model.depth, out)
    else:
        _export_transformer(params["spatial_transformer"], "spatial_spectral_transformer.1", model.depth, out)
        _export_transformer(params["spectral_transformer"], "spatial_spectral_transformer.3", model.depth, out)

    linear_idx = 2 if model.pixelwise else 1
    if "head_norm" in params:
        _export_layernorm(params["head_norm"], "mlp_head.0", out)
    if "head_linear" in params:
        _export_linear(params["head_linear"], f"mlp_head.{linear_idx}", out)
    return out
