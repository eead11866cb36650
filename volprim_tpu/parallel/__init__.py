"""Device-mesh scale-out."""

from .mesh import (
    data_mesh,
    replicate,
    shard_rays,
    sharded_grad_step,
)
