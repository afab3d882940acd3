"""Device mesh and sharding helpers.

The reference has no distributed code at all (single ``torch.device``,
SURVEY.md §2.3); the TPU-native scaling story is data parallelism over ICI:
a 1-D ``Mesh(('data',))`` over all local chips, batches sharded on axis 0,
parameters/optimizer state replicated. The jitted train step then compiles to
per-chip fwd+bwd with an XLA ``psum`` gradient all-reduce over ICI — no
NCCL-style process groups, no explicit collectives in user code.

The model at reference scale (~1.8 M params) never needs parameter sharding;
a ``model`` mesh axis is still accepted for forward-compatible 2-D meshes
(tensor-parallel experiments), mapped over attention heads.

Multi-host extension: call ``jax.distributed.initialize()`` before
``get_mesh`` and per-host input pipelines feed their local shard
(SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    devices: Optional[Sequence] = None,
    data_axis: Optional[int] = None,
    model_axis: int = 1,
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices, optionally 2-D
    with a trailing ``model`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if data_axis is None:
        data_axis = len(devices) // model_axis
    assert data_axis * model_axis == len(devices), (
        f"{data_axis=} * {model_axis=} != {len(devices)=}"
    )
    arr = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def data_axis_or_warn(mesh, batch: int, what: str) -> int:
    """Size of the ``data`` mesh axis when ``batch`` divides it, else 1.

    Pallas/Mosaic custom calls are opaque to GSPMD, so the fused kernels
    shard_map over the data axis; when the batch is not divisible the
    callers fall back to GSPMD, which may all-gather the batch onto every
    chip — warn so the perf cliff is diagnosable."""
    n_data = 1 if mesh is None else mesh.shape.get("data", 1)
    if n_data > 1 and batch % n_data != 0:
        import warnings

        warnings.warn(
            f"{what}: batch {batch} is not divisible by the data axis "
            f"({n_data}); falling back to GSPMD for the Pallas custom call, "
            "which may all-gather the batch onto every chip. Pad the batch "
            "to a multiple of the data-axis size for guaranteed sharding.",
            stacklevel=3,
        )
        return 1
    return n_data


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) onto the mesh, sharded on axis 0."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def initialize_multihost(**kwargs) -> Mesh:
    """Multi-host entry point (SURVEY.md §5.8): join the jax.distributed
    coordination service (DCN), then build the global data-parallel mesh over
    every chip in the slice. Each process subsequently feeds its LOCAL batch
    shard through :func:`shard_host_batch`. No-op re-initialization is
    tolerated so drivers can call this unconditionally.

    kwargs pass through to ``jax.distributed.initialize`` (coordinator
    address/process id come from the TPU environment automatically on Cloud
    TPU).
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:  # already initialized
        msg = str(exc).lower()
        # jax 0.9 phrases double-init as "should only be called once"
        if "already" not in msg and "only be called once" not in msg:
            raise
    return get_mesh()


def put_replicated(mesh: Mesh, a):
    """A small host array → globally-replicated device array.

    Single-process: a plain local array (jit reshards freely). Multi-process:
    every input to a global jitted computation must be a global jax.Array —
    the trainers' same-seed loader contract makes each process build the
    identical value (index batches), so the global replicated array
    assembles from the per-process copies."""
    if jax.process_count() == 1:
        import jax.numpy as jnp

        return jnp.asarray(a)
    return jax.make_array_from_process_local_data(replicate(mesh), np.asarray(a))


def shard_host_batch(mesh: Mesh, batch):
    """Assemble a GLOBAL batch from per-process local shards.

    Each host passes the rows it loaded (global_batch / process_count of
    them); the result is a jax.Array sharded over the ``data`` axis whose
    global shape stitches all hosts' shards. On a single process this is
    identical to :func:`shard_batch`.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def global_streamed_batch(mesh: Mesh, batch):
    """Host-streamed batch (pytree, identical on every process) → global
    array(s) sharded on the ``data`` axis.

    The trainers' streaming paths build each batch identically on every
    process (same-seed loader contract); each process contributes its own
    row slice and :func:`shard_host_batch` stitches the global array. On a
    single process this is a plain data-axis device_put. Raises when the
    batch does not divide over the processes — slicing would silently drop
    the tail rows AND desync the global batch size across topologies (a
    config error: use a process-divisible batch/pad size).

    Single-process, a batch whose rows do not divide the data axis is
    placed as a plain local array instead (device_put with a data-axis
    NamedSharding rejects uneven shapes; jit reshards a committed local
    array freely, and the trainers pad to the data axis in-step)."""
    nproc = jax.process_count()
    if nproc > 1:
        pid = jax.process_index()
        n_data = mesh.shape.get("data", 1)

        def _slice(x):
            x = np.asarray(x)
            # the batch must divide the FULL data axis, not just the process
            # count: a per-process slice that doesn't divide that process's
            # devices would die much deeper inside
            # make_array_from_process_local_data with an opaque
            # global-dimension error (and "process-divisible" advice alone
            # would not fix it)
            if x.shape[0] % max(n_data, nproc):
                raise ValueError(
                    f"streamed batch size {x.shape[0]} is not divisible by "
                    f"the data axis ({n_data} devices over {nproc} "
                    "processes); use a drop_last/padded loader with a "
                    "data-axis-divisible batch_size"
                )
            rows = x.shape[0] // nproc
            return x[pid * rows : (pid + 1) * rows]

        return shard_host_batch(mesh, jax.tree.map(_slice, batch))

    import jax.numpy as jnp

    n_data = mesh.shape.get("data", 1)
    return jax.tree.map(
        lambda x: (
            jax.device_put(x, batch_sharding(mesh))
            if np.shape(x)[0] % n_data == 0
            else jnp.asarray(x)
        ),
        batch,
    )
