"""Checkpointing: full-state save/restore plus reference-compatible loads.

Improves on the reference (which saves only ``model_state_dict`` + scalars,
never optimizer state — resume is re-init from weights, SURVEY.md §5.4):
checkpoints here serialize the complete TrainState (params, optimizer
moments, step, RNG key) with flax's msgpack serialization, alongside a JSON
sidecar of config + scheduler state. Directory layout mirrors the reference's
``models/{run_id}/...`` naming so downstream tooling maps 1:1:

  models/{run_id}/model_{name}_ep{epoch}.msgpack        (pretrain, pretrain.py:145-148)
  models/{run_id}/{method}_at_ep{epoch}.msgpack         (finetune, src/utils.py:596-599)
  models/{run_id}/best_{method}.msgpack                 (best val acc, :600-601)

Reference torch ``.pth`` blobs are imported by
``maskedsst_tpu.io.torch_import.load_torch_checkpoint`` (the parity path).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(
    path: str,
    state,
    config: Optional[Any] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Serialize a TrainState (or bare params pytree) + metadata sidecar."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "rng": state.rng,
    } if hasattr(state, "opt_state") else {"params": state}
    # atomic writes: best_*.msgpack is overwritten in place on every new
    # best — a crash mid-write must not truncate the previous checkpoint
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)
    meta = {"extra": extra or {}}
    if config is not None:
        meta["config"] = _jsonable(config.to_dict() if hasattr(config, "to_dict") else config)
    tmp = path + ".json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, default=str)
    os.replace(tmp, path + ".json")


def restore_checkpoint(path: str, state):
    """Restore into a template TrainState (shapes/dtypes from the template)."""
    with open(path, "rb") as f:
        data = f.read()
    template = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "rng": state.rng,
    }
    payload = serialization.from_bytes(template, data)
    return state.replace(**payload)


def restore_params(path: str, params):
    """Restore only the params pytree from a full or bare checkpoint."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        payload = serialization.from_bytes({"params": params}, data)
        return payload["params"]
    except Exception:
        # full-state checkpoint restored against a params-only template
        raw = serialization.msgpack_restore(data)
        return serialization.from_state_dict(params, raw["params"])


def load_metadata(path: str) -> Dict[str, Any]:
    with open(path + ".json") as f:
        return json.load(f)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.ndarray, jax.Array)):
        return np.asarray(obj).tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj
