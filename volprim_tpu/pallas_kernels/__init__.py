"""Pallas TPU kernels for the hot compute paths."""

from . import composite
from . import composite2
from . import composite_vjp
