from .mesh import (make_mesh, auto_mesh, make_hybrid_mesh, distributed_init,
                   batch_sharding, replicated_sharding,
                   shard_batch, pad_batch, DATA_AXIS, SPATIAL_AXIS)
from .serving import make_sharded_sample_fn
