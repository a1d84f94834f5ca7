from sd3_tpu.parallel.mesh import make_mesh, MeshConfig
from sd3_tpu.parallel.sharding import (
    param_sharding_rules,
    shard_params,
    batch_sharding,
    replicated_sharding,
)

__all__ = ["make_mesh", "MeshConfig", "param_sharding_rules", "shard_params",
           "batch_sharding", "replicated_sharding"]
