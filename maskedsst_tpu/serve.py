"""Deployment-path inference: mesh-sharded, fixed-shape batched prediction.

The reference has no serving path at all (its ``test()`` loops re-dispatch
per window batch, DeepHyperX/models.py:1157-1207). TPU-native serving needs
three properties the training stack already has:

* one compiled program per batch shape — ragged tails are padded to the
  compiled size, never recompiled;
* batches sharded over the ``data`` axis of a `jax.sharding.Mesh` so every
  local chip serves a slice (params/batch_stats replicated, no collectives
  needed for inference);
* completion forced by host fetch (tunneled backends treat
  ``block_until_ready`` as advisory — CLAUDE.md).

``Predictor`` wraps any flax model whose ``apply`` takes ``deterministic``
(ViTSpatialSpectral / ViTRGB / the whole DeepHyperX zoo, including
BatchNorm models via their ``batch_stats`` collection).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional

import jax
import numpy as np

from maskedsst_tpu.parallel.mesh import batch_sharding, get_mesh, replicate


class Predictor:
    """Jitted, mesh-sharded forward for serving.

    Args:
      model: flax module with ``apply(variables, x, deterministic=True)``.
      variables: ``{"params": ..., ["batch_stats": ...]}``.
      mesh: device mesh (default: all local devices on the ``data`` axis).
      batch_size: compiled batch size; inputs are chunked/padded to it. Must
        be divisible by the mesh's data-axis size.
      postprocess: optional traced function applied on device (e.g.
        ``lambda logits: jnp.argmax(logits, axis=1)``) so only the small
        result crosses back to the host.
    """

    def __init__(
        self,
        model,
        variables: Mapping[str, Any],
        mesh=None,
        batch_size: int = 256,
        postprocess: Optional[Callable] = None,
    ):
        self.mesh = mesh if mesh is not None else get_mesh()
        n_data = self.mesh.shape.get("data", 1)
        assert batch_size % n_data == 0, (
            f"batch_size {batch_size} not divisible by data axis {n_data}"
        )
        # Pallas custom calls are opaque to GSPMD: a fused model built
        # without a mesh would silently all-gather every sharded batch onto
        # each chip — and one bound to a STALE mesh (e.g. the training mesh
        # of a finished run, or a multi-chip mesh on a single-chip server)
        # would shard_map over devices this runtime doesn't serve with.
        # Rebind whenever the bound mesh differs from the serving mesh
        # (models/layers.py FusedTransformer docstring).
        if getattr(model, "fused", False) and hasattr(model, "mesh"):
            want = self.mesh if n_data > 1 else None
            if model.mesh is not want and model.mesh != want:
                model = model.clone(mesh=want)
        self.model = model
        self.batch_size = batch_size
        self._batch_shard = batch_sharding(self.mesh)
        self.variables = jax.device_put(dict(variables), replicate(self.mesh))
        post = postprocess or (lambda out: out)

        def fwd(variables: Dict[str, Any], x):
            out = model.apply(variables, x, deterministic=True)
            if isinstance(out, tuple):  # semi-supervised zoo nets
                out = out[0]
            return post(out)

        self._fwd = jax.jit(fwd, in_shardings=(replicate(self.mesh), self._batch_shard))

    def __call__(self, x: np.ndarray) -> np.ndarray:
        """x [N, ...] → stacked outputs [N, ...]; N may be ragged (including
        0 — the empty result keeps the output's trailing shape/dtype so
        concatenation/class-axis indexing downstream still works)."""
        n = x.shape[0]
        outs = []
        # pipeline: keep up to 3 chunks in flight so chunk i+1's host→device
        # transfer overlaps chunk i's compute (JAX dispatch is async; the
        # np.asarray fetch is the only sync point). Bounding the queue caps
        # device residency at ~3 input chunks.
        pending = []
        for start in range(0, n, self.batch_size):
            chunk = x[start : start + self.batch_size]
            real = chunk.shape[0]
            if real < self.batch_size:  # pad the tail to the compiled shape
                pad = np.zeros((self.batch_size - real, *chunk.shape[1:]), chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            # device_put straight from numpy: jnp.asarray first would place
            # the chunk on the default device and copy it a second time
            dev = jax.device_put(np.ascontiguousarray(chunk), self._batch_shard)
            pending.append((self._fwd(self.variables, dev), real))
            if len(pending) > 2:
                out, r = pending.pop(0)
                outs.append(np.asarray(out)[:r])  # host fetch = sync
        for out, r in pending:
            outs.append(np.asarray(out)[:r])
        if outs:
            return np.concatenate(outs)
        spec = jax.eval_shape(
            self._fwd,
            self.variables,
            jax.ShapeDtypeStruct((self.batch_size, *x.shape[1:]), x.dtype),
        )
        return np.empty((0, *spec.shape[1:]), spec.dtype)
