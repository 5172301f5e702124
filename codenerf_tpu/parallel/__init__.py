from codenerf_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_rays,
)

__all__ = ["make_mesh", "data_sharding", "replicated_sharding", "shard_rays"]
