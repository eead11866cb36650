"""Utilities: benchmarking, image I/O, misc."""

from . import benchmark
from . import image
from .misc import concatenate_images, time_operation
