"""TPU-native differentiable volumetric-primitive renderer.

Re-exports the subpackages, mirroring the reference package surface
(`/root/reference/volprim/__init__.py:6-16`): benchmark, cameras, io,
optimizers, utils, integrators — here organised as ops / scene / models /
optim / parallel / utils.
"""

from . import ops
from . import scene
from . import models
from . import optim
from . import parallel
from . import utils
from . import accel

# Reference-compatible aliases (volprim.cameras, volprim.io, volprim.optimizers,
# volprim.benchmark map onto the corresponding modules here).
cameras = scene.cameras
io = scene.asset
optimizers = optim
benchmark = utils.benchmark

__version__ = "0.1.0"
