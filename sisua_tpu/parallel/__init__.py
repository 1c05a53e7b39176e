from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, create_mesh,
                   replicated_sharding, shard_batch, shard_params)

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "shard_params", "DATA_AXIS", "MODEL_AXIS"]
