"""Loader for the optional C++ extension (native/volprim_native.cpp).

Builds on demand into ``native/_build`` the first time it is requested (the
environment forbids pip installs, so the extension is compiled directly with
the system toolchain). All callers degrade to pure-numpy paths when the
toolchain or module is unavailable.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_mod = None
_tried = False


def _build_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "native", "_build")


def get() -> "object | None":
    """Return the native module, building it if needed; None on failure."""
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    build = _build_dir()
    sys.path.insert(0, build)
    try:
        import volprim_native  # type: ignore

        _mod = volprim_native
        return _mod
    except ImportError:
        pass
    src = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "native", "volprim_native.cpp"
    )
    if not os.path.exists(src):
        return None
    os.makedirs(build, exist_ok=True)
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(build, f"volprim_native{ext}")
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        f"-I{include}", src, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        import importlib

        _mod = importlib.import_module("volprim_native")
    except Exception:
        _mod = None
    return _mod


def parse_ply_columns(path: str):
    """Native PLY vertex-table parse -> {name: float32 array} or None."""
    mod = get()
    if mod is None:
        return None
    import numpy as np

    try:
        names, blob, n_props, n_verts = mod.parse_ply(path)
    except ValueError:
        return None  # e.g. ascii PLY; caller falls back
    mat = np.frombuffer(blob, dtype=np.float32).reshape(n_props, n_verts)
    return {name: mat[j] for j, name in enumerate(names)}


def morton_argsort(centers) -> "object | None":
    """Native Morton code + radix argsort -> uint32 permutation or None."""
    mod = get()
    if mod is None:
        return None
    import numpy as np

    c = np.ascontiguousarray(np.asarray(centers, np.float32))
    codes = mod.morton_codes(c.tobytes())
    perm = mod.radix_argsort(codes)
    return np.frombuffer(perm, dtype=np.uint32).astype(np.int64)
