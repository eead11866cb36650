"""Primitive acceleration structures (AABB chunk culling, grids)."""
