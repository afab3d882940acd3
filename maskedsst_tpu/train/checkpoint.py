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


def _host_leaf(leaf, fetch: bool = True):
    """Fetch one pytree leaf to host numpy, multi-process-safely.

    Arrays whose shards live on other hosts (e.g. a batch-sharded leaf) are
    assembled with a ``process_allgather`` COLLECTIVE — so this must run on
    EVERY process, in the same tree order (jax.tree.map guarantees that).
    Replicated or fully-addressable arrays convert directly, and ONLY when
    ``fetch`` — non-primary processes skip the device→host copy for leaves
    that need no collective (on an N-host pod with a replicated TrainState
    that copy is the whole params+opt_state payload, paid N-1 times per
    save and then discarded)."""
    if not isinstance(leaf, jax.Array):
        return leaf  # python scalars / numpy pass through untouched
    if not (leaf.is_fully_addressable or leaf.is_fully_replicated):
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(leaf, tiled=True)
        return np.asarray(gathered) if fetch else None
    return np.asarray(leaf) if fetch else None


def save_checkpoint(
    path: str,
    state,
    config: Optional[Any] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Serialize a TrainState (or bare params pytree) + metadata sidecar.

    Multi-host-safe: call from EVERY process (host materialization may
    involve collectives); only process 0 touches the filesystem, so N
    processes never race on the same file (the reference is single-process,
    SURVEY.md §2.3 — this contract is new surface)."""
    payload = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "rng": state.rng,
    } if hasattr(state, "opt_state") else {"params": state}
    primary = jax.process_index() == 0
    payload = jax.tree.map(lambda leaf: _host_leaf(leaf, fetch=primary), payload)
    if not primary:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # atomic writes: best_*.msgpack is overwritten in place on every new
    # best — a crash mid-write must not truncate the previous checkpoint.
    # The tmp name is pid-unique so two writers that each believe they are
    # primary (e.g. unrelated single-process runs sharing a models dir)
    # cannot interleave inside one staging file.
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)
    meta = {"extra": extra or {}}
    if config is not None:
        meta["config"] = _jsonable(config.to_dict() if hasattr(config, "to_dict") else config)
    tmp = f"{path}.json.{os.getpid()}.tmp"
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
