"""Scene data model and I/O."""

from . import asset
from . import asset_interop
from . import cameras
from . import colmap
from . import ellipsoids
from . import mesh
from . import ply
from . import vol

from .asset import load_asset, save_asset
from .cameras import (
    CameraSpecs,
    ColmapCameraSpecsIO,
    JSONCameraSpecsIO,
    KRTCameraSpecsIO,
    generate_rays,
    look_at,
)
from .ellipsoids import EllipsoidScene, EllipsoidsFactory, lattice_init
from .mesh import TriangleMesh
from .ply import load_ply, save_ply
from .vol import GridVolume, load_vol, procedural_smoke, save_vol
