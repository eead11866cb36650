"""Scene asset checkpointing.

The reference's "Python asset" format is an importable Mitsuba scene module
(``/root/reference/volprim/io.py:43-273``). The TPU-native analogue keeps the
same role (self-contained scene checkpoint directory with externalized
payloads, written at the end of the optimization pipelines:
``optimize_volume.py:277``, ``refine_3dg_dataset.py:200``) with a JAX-friendly
layout:

    asset_dir/
      scene.json        integrator + emitter configs, camera specs
      primitives.ply    the ellipsoids in 3DGS-convention PLY (interoperable
                        with the reference and any 3DGS viewer)
      <name>.npy        any extra array payloads (e.g. envmap bitmaps)

Optimizer state is *not* checkpointed, matching the reference (SURVEY.md §5);
training-state checkpoints live in volprim_tpu.optim (pytree .npz).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

from . import ply as ply_io
from .cameras import CameraSpecs
from .ellipsoids import EllipsoidScene


def save_asset(
    folder: str,
    primitives: EllipsoidScene,
    cameras: Optional[List[CameraSpecs]] = None,
    integrator: Optional[Dict[str, Any]] = None,
    emitters: Optional[Dict[str, Any]] = None,
    arrays: Optional[Dict[str, np.ndarray]] = None,
):
    os.makedirs(folder, exist_ok=True)
    ply_io.save_ply(primitives, os.path.join(folder, "primitives.ply"))
    meta: Dict[str, Any] = {
        "format": "volprim_tpu_asset_v1",
        "extent": float(primitives.extent),
        "integrator": integrator or {},
        "emitters": emitters or {},
        "sensors": [c.to_dict() for c in (cameras or [])],
        "arrays": [],
    }
    for name, arr in (arrays or {}).items():
        np.save(os.path.join(folder, f"{name}.npy"), np.asarray(arr))
        meta["arrays"].append(name)
    with open(os.path.join(folder, "scene.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_asset(folder: str) -> Dict[str, Any]:
    with open(os.path.join(folder, "scene.json")) as f:
        meta = json.load(f)
    assert meta.get("format") == "volprim_tpu_asset_v1", "unknown asset format"
    primitives = ply_io.load_ply(
        os.path.join(folder, "primitives.ply"), extent=meta.get("extent", 3.0)
    )
    cameras = [CameraSpecs.from_dict(d) for d in meta.get("sensors", [])]
    arrays = {
        name: np.load(os.path.join(folder, f"{name}.npy"))
        for name in meta.get("arrays", [])
    }
    return {
        "primitives": primitives,
        "cameras": cameras,
        "integrator": meta.get("integrator", {}),
        "emitters": meta.get("emitters", {}),
        "arrays": arrays,
    }
