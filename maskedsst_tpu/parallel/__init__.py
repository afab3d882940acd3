from maskedsst_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    initialize_multihost,
    replicate,
    shard_batch,
    shard_host_batch,
)
