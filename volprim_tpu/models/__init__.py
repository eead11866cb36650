"""Integrators (the reference's three registered plugins, rebuilt wavefront).

- tomography: absorption-only (reference volprim_tomography)
- rf: radiance-field / 3DGS compositing (reference volprim_rf)
- prb: volumetric path tracer with NEE (reference volprim_prb)
"""

from . import base  # noqa: F401

REGISTRY = {}


def register_integrator(name):
    def deco(fn):
        REGISTRY[name] = fn
        return fn

    return deco


from . import tomography  # noqa: E402,F401
from .base import Film, render, render_batch, render_with_spp_grad  # noqa: E402
from . import rf  # noqa: E402,F401
from . import prb  # noqa: E402,F401
from . import gridvol  # noqa: E402,F401

from .tomography import TomographyConfig  # noqa: E402
from .rf import RFConfig  # noqa: E402
from .prb import PRBConfig  # noqa: E402

CONFIGS = {
    "volprim_tomography": TomographyConfig,
    "volprim_rf": RFConfig,
    "volprim_prb": PRBConfig,
}

