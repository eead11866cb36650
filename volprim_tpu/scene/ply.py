"""3DGS-convention PLY codec for ellipsoid primitives.

TPU-build replacement for Mitsuba's C++ PLY loading in the Ellipsoids shape
plugin plus the reference's exporter (``/root/reference/volprim/io.py:362-411``).
Field conventions (verified against ``resources/smoke.ply`` and io.py):

- ``x, y, z``: centers; ``nx, ny, nz``: zero-filled normals (ignored on read)
- ``scale_0..2``: **log** scales (io.py:372)
- ``rot_0..3``: quaternion stored (w, x, y, z); reordered to the in-memory
  (x, y, z, w) layout on read (io.py:373)
- ``opacity``: **logit**-encoded (io.py:388-389) -> sigmoid on read
- ``f_dc_0..2`` + ``f_rest_*``: SH coefficients in the 3DGS channel-major
  layout; converted to/from the basis-major interleaved [N, K, 3] layout with
  the column mapping of io.py:377-386
- any other ``name_<i>`` property group (e.g. ``sigma_t_0``, ``albedo_0..2``)
  becomes a raw [N, D] attribute.
"""

from __future__ import annotations

import re
from typing import Dict

import jax.numpy as jnp
import numpy as np

from .ellipsoids import EllipsoidScene

_PLY_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "<i2", "ushort": "<u2", "int": "<i4", "int32": "<i4",
    "uint": "<u4", "uint32": "<u4",
}


def read_ply_vertex_table(path: str, use_native: bool = True) -> dict[str, np.ndarray]:
    """Parse a PLY file's 'vertex' element into {property_name: column}.

    Binary files go through the threaded C++ parser when available
    (volprim_tpu.native); ascii and fallback paths are pure numpy.
    """
    if use_native:
        from .. import native

        cols = native.parse_ply_columns(path)
        if cols is not None:
            return cols
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii", errors="replace").splitlines()
    assert header[0].strip() == "ply", "not a PLY file"

    fmt = None
    count = None
    props: list[tuple[str, str]] = []
    in_vertex = False
    for line in header[1:]:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            in_vertex = parts[1] == "vertex"
            if in_vertex:
                count = int(parts[2])
        elif parts[0] == "property" and in_vertex:
            assert parts[1] != "list", "list properties unsupported for vertices"
            props.append((parts[-1], _PLY_DTYPES[parts[1]]))

    assert count is not None, "no vertex element found"
    if fmt == "binary_little_endian":
        dtype = np.dtype([(n, t) for n, t in props])
        table = np.frombuffer(data[end:end + dtype.itemsize * count], dtype=dtype)
        return {n: np.ascontiguousarray(table[n]) for n, _ in props}
    if fmt == "ascii":
        rows = np.loadtxt(
            data[end:].decode("ascii").splitlines(), dtype=np.float64, ndmin=2
        )[:count]
        return {
            n: rows[:, i].astype(np.dtype(t))
            for i, (n, t) in enumerate(props)
        }
    raise ValueError(f"unsupported PLY format: {fmt}")


def _sh_from_ply(f_dc: np.ndarray, f_rest: np.ndarray) -> np.ndarray:
    """(f_dc [N,3], f_rest [N,3(K-1)] channel-major) -> [N, 3K] basis-major
    interleaved (inverse of io.py:377-386)."""
    n = f_dc.shape[0]
    k_rest = f_rest.shape[1] // 3
    k = k_rest + 1
    sh = np.zeros((n, k, 3), np.float32)
    sh[:, 0, :] = f_dc
    for j in range(1, k):
        for ch in range(3):
            sh[:, j, ch] = f_rest[:, ch * k_rest + (j - 1)]
    return sh.reshape(n, 3 * k)


def _sh_to_ply(sh_coeffs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[N, 3K] basis-major interleaved -> (f_dc, f_rest channel-major)."""
    n = sh_coeffs.shape[0]
    sh = sh_coeffs.reshape(n, -1, 3)
    k = sh.shape[1]
    f_dc = sh[:, 0, :]
    f_rest = np.zeros((n, 3 * (k - 1)), np.float32)
    for j in range(1, k):
        for ch in range(3):
            f_rest[:, ch * (k - 1) + (j - 1)] = sh[:, j, ch]
    return f_dc, f_rest


def load_ply(path: str, extent: float = 3.0) -> EllipsoidScene:
    """Load a 3DGS-convention ellipsoids PLY into an EllipsoidScene."""
    cols = read_ply_vertex_table(path)
    centers = np.stack(
        [cols["x"], cols["y"], cols["z"]], axis=-1
    ).astype(np.float32)
    scales = np.exp(
        np.stack([cols["scale_0"], cols["scale_1"], cols["scale_2"]], axis=-1)
    ).astype(np.float32)
    # Stored (w, x, y, z) -> memory (x, y, z, w), normalized.
    quats = np.stack(
        [cols["rot_1"], cols["rot_2"], cols["rot_3"], cols["rot_0"]], axis=-1
    ).astype(np.float32)
    quats /= np.maximum(np.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)

    consumed = {
        "x", "y", "z", "nx", "ny", "nz",
        "scale_0", "scale_1", "scale_2",
        "rot_0", "rot_1", "rot_2", "rot_3",
    }
    attrs: Dict[str, jnp.ndarray] = {}

    if "opacity" in cols:
        logit = cols["opacity"].astype(np.float32)
        attrs["opacities"] = jnp.asarray(
            (1.0 / (1.0 + np.exp(-logit)))[:, None]
        )
        consumed.add("opacity")

    if "f_dc_0" in cols:
        f_dc = np.stack(
            [cols["f_dc_0"], cols["f_dc_1"], cols["f_dc_2"]], axis=-1
        ).astype(np.float32)
        rest_names = sorted(
            (n for n in cols if n.startswith("f_rest_")),
            key=lambda n: int(n.split("_")[-1]),
        )
        f_rest = (
            np.stack([cols[n] for n in rest_names], axis=-1).astype(np.float32)
            if rest_names
            else np.zeros((f_dc.shape[0], 0), np.float32)
        )
        attrs["sh_coeffs"] = jnp.asarray(_sh_from_ply(f_dc, f_rest))
        consumed |= {"f_dc_0", "f_dc_1", "f_dc_2", *rest_names}

    # Remaining name_<i> groups -> raw attributes.
    groups: Dict[str, Dict[int, np.ndarray]] = {}
    for name, col in cols.items():
        if name in consumed:
            continue
        m = re.fullmatch(r"(.+)_(\d+)", name)
        if m:
            groups.setdefault(m.group(1), {})[int(m.group(2))] = col
        else:
            groups.setdefault(name, {})[0] = col
    for gname, members in groups.items():
        dims = sorted(members)
        attrs[gname] = jnp.asarray(
            np.stack([members[i] for i in dims], axis=-1).astype(np.float32)
        )

    return EllipsoidScene(
        centers=jnp.asarray(centers),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        attrs=attrs,
        extent=extent,
    )


def save_ply(scene: EllipsoidScene, path: str):
    """Write an EllipsoidScene to a 3DGS-convention PLY (io.py:362-411)."""
    centers = np.asarray(scene.centers, np.float32)
    n = centers.shape[0]
    scales = np.log(np.maximum(np.asarray(scene.scales, np.float32), 1e-6))
    q = np.asarray(scene.quats, np.float32)
    quats = q[:, [3, 0, 1, 2]]  # (x,y,z,w) -> (w,x,y,z), io.py:373
    normals = np.zeros_like(centers)

    names = ["x", "y", "z", "nx", "ny", "nz"]
    columns = [centers, normals]

    attrs = dict(scene.attrs)
    is_3dg = "sh_coeffs" in attrs and "opacities" in attrs
    if is_3dg:
        f_dc, f_rest = _sh_to_ply(np.asarray(attrs.pop("sh_coeffs")))
        names += ["f_dc_0", "f_dc_1", "f_dc_2"]
        names += [f"f_rest_{i}" for i in range(f_rest.shape[1])]
        columns += [f_dc, f_rest]
        op = np.clip(np.asarray(attrs.pop("opacities")), 1e-8, 1.0 - 1e-8)
        names += ["opacity"]
        columns += [np.log(op) - np.log(1.0 - op)]  # logit, io.py:388-389
    for k in sorted(attrs):
        v = np.asarray(attrs[k], np.float32)
        v = v.reshape(n, -1)
        names += [f"{k}_{i}" for i in range(v.shape[1])]
        columns += [v]

    names += ["scale_0", "scale_1", "scale_2", "rot_0", "rot_1", "rot_2", "rot_3"]
    columns += [scales, quats]

    table = np.concatenate(
        [c.reshape(n, -1).astype("<f4") for c in columns], axis=1
    )
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        header += [f"property float {name}" for name in names]
        header += ["end_header"]
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(np.ascontiguousarray(table).tobytes())
