"""Native C++ extension vs pure-python fallbacks."""

import numpy as np
import pytest

from volprim_tpu import native
from volprim_tpu.scene import ply as ply_io


@pytest.fixture(scope="module")
def mod():
    m = native.get()
    if m is None:
        pytest.skip("native toolchain unavailable")
    return m


def test_native_ply_matches_python(mod):
    path = "/root/reference/resources/smoke.ply"
    cols_native = ply_io.read_ply_vertex_table(path, use_native=True)
    cols_py = ply_io.read_ply_vertex_table(path, use_native=False)
    assert set(cols_native) == set(cols_py)
    for k in cols_py:
        np.testing.assert_allclose(
            cols_native[k], cols_py[k].astype(np.float32), rtol=1e-6
        )


def test_native_morton_sort_matches_numpy(mod):
    import jax.numpy as jnp

    from volprim_tpu.accel import clusters

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4096, 3)).astype(np.float32)
    perm_native = native.morton_argsort(centers)
    codes = np.asarray(clusters.morton_codes(jnp.asarray(centers)))
    # radix sort is stable; compare against stable numpy argsort
    perm_np = np.argsort(codes.astype(np.uint32), kind="stable")
    np.testing.assert_array_equal(perm_native, perm_np)


def test_native_ply_load_end_to_end(mod):
    from volprim_tpu import scene

    s = scene.load_ply("/root/reference/resources/smoke.ply")
    assert s.num_prims == 835


def test_native_ply_signed_types(mod, tmp_path):
    """Signed/wide integer PLY columns decode with correct signedness."""
    import struct

    n = 4
    path = tmp_path / "ints.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\n"
        "property char s8\n"
        "property short s16\n"
        "property ushort u16\n"
        "property int s32\n"
        "property uint u32\n"
        "end_header\n"
    )
    rows = [
        (0.5, -5, -1000, 60000, -123456, 3_000_000_000),
        (1.5, 127, 32767, 0, 2**31 - 1, 0),
        (-2.0, -128, -32768, 65535, -(2**31), 2**32 - 1),
        (3.0, 0, 7, 8, 9, 10),
    ]
    with open(path, "wb") as f:
        f.write(header.encode())
        for r in rows:
            f.write(struct.pack("<fbhHiI", *r))
    cols_native = ply_io.read_ply_vertex_table(str(path), use_native=True)
    cols_py = ply_io.read_ply_vertex_table(str(path), use_native=False)
    for k in cols_py:
        np.testing.assert_allclose(
            cols_native[k], cols_py[k].astype(np.float32), rtol=1e-6,
            err_msg=k,
        )
    np.testing.assert_allclose(
        cols_native["s8"], [-5, 127, -128, 0]
    )
    np.testing.assert_allclose(
        cols_native["u32"],
        np.asarray([3_000_000_000, 0, 2**32 - 1, 10], np.float32),
    )
