"""Optimization: bounds-aware Adam and losses."""

from .bounded_adam import BoundedAdam, load_state, save_state
from .losses import l1, l2, psnr
