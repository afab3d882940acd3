"""Tensor-parallel sharding rules for the model's parameter tree.

The reference has no parallelism at all (SURVEY.md §2.3); at reference scale
(~1.8 M params) data parallelism is the right axis and parameters stay
replicated. For scaled-up configurations (wider dim / more heads) this module
annotates the param tree with Megatron-style shardings over the mesh's
``model`` axis and lets GSPMD insert the collectives:

* attention QKV kernel [D, 3I]  → shard output columns ('model' on axis 1),
  i.e. heads split across chips;
* attention output kernel [I, D] → shard input rows (axis 0) — the partial
  products all-reduce back;
* MLP fc1 [D, F] → columns; fc2 [F, D] → rows;
* LayerNorms, embeddings, heads, and ALL biases → replicated (including
  column-parallel layers' biases: they are small, and GSPMD re-shards the
  bias add for free — _spec_for's fall-through P()).

Note on the fused QKV kernel: GSPMD block-shards the WHOLE 3I column axis
into contiguous tp chunks, so with the canonical [q|k|v] column order a
shard can span a q/k/v boundary (tp=2: chip 0 holds all of q plus half of
k) — weight sharding is NOT per-head-aligned across the thirds, and GSPMD
inserts reshards around the per-head attention split. This is
semantics-preserving and balances memory, which is TP's purpose at scaled
configurations; a fully Megatron-local pattern would need a head-grouped
QKV column order, which would break the torch-checkpoint layout parity
(io/torch_import.py). heads % tp == 0 is still asserted so the activation
head split itself is even.

The rules apply to the XLA transformer path (``fused=False``): Pallas kernels
are opaque to GSPMD partitioning. The fused path stays the single-chip/DP
fast path; TP targets memory-bound scaled configurations.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf, tp: int) -> P:
    keys = [str(getattr(k, "key", k)) for k in path]
    joined = "/".join(keys)
    if "to_qkv" in joined and keys[-1] == "kernel":
        return P(None, "model")
    if "to_out" in joined and keys[-1] == "kernel":
        return P("model", None)
    if "fc1" in joined and keys[-1] == "kernel":
        return P(None, "model")
    if "fc2" in joined and keys[-1] == "kernel":
        return P("model", None)
    return P()  # replicated: norms, biases, embeddings, heads


def tensor_parallel_shardings(params: Any, mesh: Mesh, heads: int) -> Any:
    """NamedSharding tree for ``params`` under ``mesh`` (axes 'data',
    'model')."""
    tp = mesh.shape["model"]
    assert heads % tp == 0, f"{heads=} must divide over model axis {tp=}"
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, tp)), params
    )


def place_params(params: Any, mesh: Mesh, heads: int) -> Any:
    """Device-put the param tree with tensor-parallel shardings."""
    return jax.tree_util.tree_map(
        lambda leaf, sh: jax.device_put(leaf, sh),
        params,
        tensor_parallel_shardings(params, mesh, heads),
    )
