"""Primitive acceleration: ray-tile cone culling + Morton cluster hierarchy."""

from . import clusters
from . import tiles
from .clusters import ClusterIndex, build_clusters, morton_codes
from .tiles import cone_cull_keys, shortlist, tile_cones
