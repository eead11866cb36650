"""Device-mesh scale-out."""

from .mesh import (
    data_mesh,
    init_multihost,
    replicate,
    shard_rays,
    sharded_grad_step,
)
