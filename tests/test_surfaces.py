"""Mesh surfaces + vertex BSDFs + prb surface vertices.

Covers the reference capabilities unlocked in round 2: triangle-mesh scene
intersection (common.py:461-466), the radiosity vertex BSDFs
(scripts/radiosity/vertex_bsdf.py, bsdf_utils.py) and the surface branch of
the prb path loop (volprim_prb.py:134-137,195-235,262-282).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volprim_tpu import scene
from volprim_tpu.models import prb
from volprim_tpu.ops import bsdf as bsdf_ops
from volprim_tpu.ops import envmap
from volprim_tpu.scene import mesh as mesh_mod


# ---------------------------------------------------------------------------
# Mesh geometry
# ---------------------------------------------------------------------------


def test_rect_intersection_analytic():
    m = mesh_mod.make_rect([0, 0, 2.0], [1, 0, 0], [0, 1, 0],
                           attrs={"base_color": [1.0, 1.0, 1.0]})
    o = jnp.asarray([[0.2, -0.3, 0.0], [3.0, 0.0, 0.0], [0.0, 0.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    valid, t, fid, uv = mesh_mod.intersect(m, o, d)
    assert bool(valid[0]) and not bool(valid[1]) and not bool(valid[2])
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-5)


def test_mesh_normals_and_interpolation():
    m = mesh_mod.cornell_box()
    # floor normal points up (into the box)
    fn = np.asarray(m.face_normals())
    areas = np.asarray(m.face_areas())
    assert np.allclose(areas, 2.0)  # each wall is 2x2 = two 2-area tris
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    valid, t, fid, uv = mesh_mod.intersect(m, o, d)
    assert bool(valid[0])
    np.testing.assert_allclose(float(t[0]), 1.0, rtol=1e-5)
    color = m.interpolate("base_color", fid, uv)
    np.testing.assert_allclose(np.asarray(color[0]), [0.73] * 3, rtol=1e-5)
    # left wall is red
    valid, t, fid, uv = mesh_mod.intersect(
        m, o, jnp.asarray([[-1.0, 0.0, 0.0]])
    )
    color = m.interpolate("base_color", fid, uv)
    np.testing.assert_allclose(
        np.asarray(color[0]), [0.65, 0.05, 0.05], rtol=1e-5
    )


def test_surface_sampling_area_weighted():
    m = mesh_mod.merge([
        mesh_mod.make_rect([0, 0, 0], [1, 0, 0], [0, 1, 0],
                           attrs={"base_color": [1, 1, 1]}),
        mesh_mod.make_rect([5, 0, 0], [3, 0, 0], [0, 3, 0],
                           attrs={"base_color": [1, 1, 1]}),
    ])
    pts, normals, fid, bary, pdf = mesh_mod.sample_surface(
        m, jax.random.PRNGKey(0), 20000
    )
    # areas 4 vs 36: ~90% of samples on the big rect
    frac_big = float(jnp.mean((fid >= 2).astype(jnp.float32)))
    assert abs(frac_big - 0.9) < 0.02
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / 40.0, rtol=1e-5)
    assert np.allclose(np.abs(np.asarray(normals)[:, 2]), 1.0, atol=1e-5)


def test_icosphere_watertight_normals():
    m = mesh_mod.make_icosphere([0, 0, 0], 1.0, subdiv=2,
                                attrs={"base_color": [1, 1, 1]})
    vn = np.asarray(m.vertex_normals())
    v = np.asarray(m.vertices)
    # outward normals ~ radial directions
    cos = np.sum(vn * v / np.linalg.norm(v, axis=-1, keepdims=True), -1)
    assert cos.min() > 0.99


# ---------------------------------------------------------------------------
# BSDFs
# ---------------------------------------------------------------------------


def _attrs(n, base=0.7, rough=0.4, metal=0.0):
    return {
        "base_color": jnp.full((n, 3), base),
        "roughness": jnp.full((n,), rough),
        "metallic": jnp.full((n,), metal),
    }


def test_diffuse_white_furnace():
    """Integral of eval over the hemisphere equals base_color."""
    b = bsdf_ops.Diffuse()
    n = 100_000
    wi = jnp.tile(jnp.asarray([[0.3, 0.1, 0.95]]), (n, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    wo, pdf, w = b.sample(_attrs(n), wi, jax.random.PRNGKey(0))
    est = np.asarray(w, np.float64).mean(0)  # E[eval/pdf] = albedo
    np.testing.assert_allclose(est, 0.7, rtol=1e-5)
    # eval/pdf consistency at sampled directions
    val = b.eval(_attrs(n), wi, wo)
    np.testing.assert_allclose(
        np.asarray(val / pdf[:, None]), np.asarray(w), rtol=1e-5
    )


@pytest.mark.parametrize("rough,metal", [(0.3, 0.0), (0.7, 1.0), (0.15, 0.5)])
def test_principled_sample_eval_pdf_consistency(rough, metal):
    """MC estimate of directional albedo via BSDF sampling must match a
    uniform-hemisphere quadrature of eval (validates pdf correctness)."""
    b = bsdf_ops.Principled(has_metallic=True)
    n = 200_000
    key = jax.random.PRNGKey(1)
    wi = jnp.tile(jnp.asarray([[0.4, -0.2, 0.8]]), (n, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    attrs = _attrs(n, base=0.6, rough=rough, metal=metal)

    wo, pdf, w = b.sample(attrs, wi, key)
    est_sample = np.asarray(w, np.float64).mean(0)

    # uniform hemisphere quadrature
    k2 = jax.random.PRNGKey(2)
    u = jax.random.uniform(k2, (n, 2))
    z = u[:, 0]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2 * jnp.pi * u[:, 1]
    wo_u = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
    val = b.eval(attrs, wi, wo_u)
    est_quad = np.asarray(val, np.float64).mean(0) * 2 * np.pi
    np.testing.assert_allclose(est_sample, est_quad, rtol=0.03)

    # pdf integrates to <= 1 over the hemisphere: the VNDF spec lobe is
    # sub-normalized by the macro/micro-compatibility rejection (Mitsuba
    # rejects those samples too, vertex_bsdf.py:322-328), so high roughness
    # loses mass; it must never exceed 1.
    pdf_u = np.asarray(b.pdf(attrs, wi, wo_u))
    integral = pdf_u.mean() * 2 * np.pi
    assert 0.5 < integral < 1.02, integral


def test_principled_smooth_metal_is_specular():
    """Low roughness metal: samples concentrate near the mirror direction."""
    b = bsdf_ops.Principled(has_metallic=True)
    n = 50_000
    wi = jnp.tile(jnp.asarray([[0.5, 0.0, 0.8660254]]), (n, 1))
    attrs = _attrs(n, base=0.9, rough=0.05, metal=1.0)
    wo, pdf, w = b.sample(attrs, wi, jax.random.PRNGKey(3))
    mirror = jnp.asarray([-0.5, 0.0, 0.8660254])
    cos = np.asarray(jnp.sum(wo * mirror, -1))
    assert np.median(cos) > 0.995


# ---------------------------------------------------------------------------
# prb with surfaces
# ---------------------------------------------------------------------------


def _tiny_smoke(n=8):
    f = scene.EllipsoidsFactory()
    rng = np.random.default_rng(0)
    for _ in range(n):
        f.add(mean=rng.normal(size=3) * 0.2 + [0, 0.8, 0], scale=0.25,
              sigma_t=1.0, albedo=0.8)
    return f.build()


def test_prb_surface_white_furnace():
    """A pure-white diffuse plane under a uniform environment returns the
    environment radiance (energy conservation of the surface vertex)."""
    m = mesh_mod.make_rect([0, 0, 0], [50, 0, 0], [0, 0, -50],
                           attrs={"base_color": [1.0, 1.0, 1.0]})
    s = _tiny_smoke(1)
    s.attrs["sigma_t"] = s.attrs["sigma_t"] * 0.0  # inert medium
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    n = 4096
    o = jnp.tile(jnp.asarray([[0.0, 2.0, 0.0]]), (n, 1))
    d = jnp.asarray(
        np.stack([
            np.full(n, 0.2), np.full(n, -1.0), np.full(n, 0.1)
        ], -1), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    cfg = prb.PRBConfig(max_overlaps=4, max_windows=2, bounce_cap=24,
                        chunk_size=8, cluster_size=8)
    out = np.asarray(prb.radiance(
        s, em, o, d, cfg, jax.random.PRNGKey(0), mesh=m,
        bsdf=bsdf_ops.Diffuse(),
    ))
    assert np.isfinite(out).all()
    assert abs(out.mean() - 1.0) < 0.02, out.mean()


def test_prb_surface_blocks_env():
    """A black plane occludes the environment: rays toward it return ~0,
    rays away return the env."""
    m = mesh_mod.make_rect([0, 0, 0], [50, 0, 0], [0, 0, -50],
                           attrs={"base_color": [0.0, 0.0, 0.0]})
    s = _tiny_smoke(1)
    s.attrs["sigma_t"] = s.attrs["sigma_t"] * 0.0
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    o = jnp.asarray([[0.0, 2.0, 0.0], [0.0, 2.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]])
    cfg = prb.PRBConfig(max_overlaps=4, max_windows=2, bounce_cap=4,
                        chunk_size=8, cluster_size=8)
    out = np.asarray(prb.radiance(
        s, em, o, d, cfg, jax.random.PRNGKey(0), mesh=m,
    ))
    assert out[0].max() < 1e-3  # black plane
    np.testing.assert_allclose(out[1], 1.0, rtol=1e-4)  # open sky


def test_prb_medium_above_surface_consistent():
    """Smoke over a 0.9-albedo floor under a uniform env: the floor replaces
    unit radiance from below with ~0.9 of it, so the image darkens slightly
    but stays energy-sane."""
    m = mesh_mod.make_rect([0, 0.0, 0], [5, 0, 0], [0, 0, -5],
                           attrs={"base_color": [0.9, 0.9, 0.9]})
    s = _tiny_smoke(8)
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    n = 2048
    rng = np.random.default_rng(1)
    o = jnp.tile(jnp.asarray([[0.0, 2.5, 0.0]]), (n, 1))
    dd = rng.normal(size=(n, 3)) * 0.15 + [0, -1.0, 0]
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True),
                    jnp.float32)
    cfg = prb.PRBConfig(max_overlaps=8, max_windows=3, bounce_cap=16,
                        chunk_size=8, cluster_size=8)
    with_floor = np.asarray(prb.radiance(
        s, em, o, d, cfg, jax.random.PRNGKey(2), mesh=m,
    ))
    without = np.asarray(prb.radiance(
        s, em, o, d, cfg, jax.random.PRNGKey(2),
    ))
    assert np.isfinite(with_floor).all()
    # floor absorbs 10%: slightly darker, but within the 0.9-albedo bound
    assert with_floor.mean() < without.mean()
    assert with_floor.mean() > 0.85 * without.mean()


def test_prb_no_mesh_unchanged():
    """mesh=None path must be identical to the pre-surface integrator."""
    s = _tiny_smoke(8)
    em = envmap.ConstantEmitter(radiance=jnp.ones(3))
    n = 512
    o = jnp.tile(jnp.asarray([[0.0, 0.8, -3.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    cfg = prb.PRBConfig(max_overlaps=8, max_windows=3, bounce_cap=8,
                        chunk_size=8, cluster_size=8)
    a = np.asarray(prb.radiance(s, em, o, d, cfg, jax.random.PRNGKey(4)))
    b = np.asarray(prb.radiance(s, em, o, d, cfg, jax.random.PRNGKey(4),
                                mesh=None))
    np.testing.assert_array_equal(a, b)
