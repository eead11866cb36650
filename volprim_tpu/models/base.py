"""Integrator driver: wavefront rendering loop, film accumulation, chunking.

Replaces the reference's ``mi.render`` / RBIntegrator plumbing (film +
sampler + sensor orchestration). Rendering is organized as fixed-shape
wavefront stages: generate jittered camera rays -> evaluate a radiance
function over the whole wavefront -> splat to the film; spp is a
``lax.scan`` so memory stays at one wavefront.

The per-sample RNG is counter-based (``jax.random.fold_in`` of seed, spp
index) — the TPU equivalent of the reference's ``independent`` sampler with
its "same sequence for primal and adjoint" requirement (volprim_rf.py:177),
which JAX AD satisfies by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import envmap as envmap_ops
from ..ops import filters
from ..scene.cameras import CameraSpecs, rays_from_pixels
from ..scene.ellipsoids import EllipsoidScene


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Film:
    """Accumulated splats + filter weights."""

    img: jnp.ndarray  # [H, W, 3]
    wgt: jnp.ndarray  # [H, W]

    def develop(self) -> jnp.ndarray:
        return filters.develop(self.img, self.wgt)


def pad_primitives(prims: EllipsoidScene, multiple: int) -> EllipsoidScene:
    """Pad the primitive arrays to a multiple of the chunk size with inert
    primitives (tiny, far away, zero density) so chunked wavefront stages have
    static shapes. Run outside jit (shapes change)."""
    n = prims.num_prims
    n_pad = (-n) % multiple
    if n_pad == 0:
        return prims
    # Moderate values: extreme centers/scales overflow the f32 quadric
    # coefficients (b^2 -> inf) and would spuriously validate intersections.
    # Consumers must additionally mask by index < num_prims.
    far = jnp.full((n_pad, 3), 1e4, prims.centers.dtype)
    tiny = jnp.ones((n_pad, 3), prims.scales.dtype)
    qid = jnp.tile(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], prims.quats.dtype), (n_pad, 1)
    )
    attrs = {
        k: jnp.concatenate([v, jnp.zeros((n_pad,) + v.shape[1:], v.dtype)])
        for k, v in prims.attrs.items()
    }
    return EllipsoidScene(
        centers=jnp.concatenate([prims.centers, far]),
        scales=jnp.concatenate([prims.scales, tiny]),
        quats=jnp.concatenate([prims.quats, qid]),
        attrs=attrs,
        extent=prims.extent,
    )


def _film_coords(spec: CameraSpecs, key: Optional[jax.Array], jitter: bool):
    h, w = spec.height, spec.width
    px = jnp.tile(jnp.arange(w, dtype=jnp.float32)[None, :], (h, 1)).reshape(-1)
    py = jnp.tile(jnp.arange(h, dtype=jnp.float32)[:, None], (1, w)).reshape(-1)
    if jitter and key is not None:
        off = jax.random.uniform(key, (px.shape[0], 2))
        return px + off[:, 0], py + off[:, 1]
    return px + 0.5, py + 0.5



def _as_key(seed):
    """Accept python ints, traced int scalars, or PRNG keys as the seed."""
    if isinstance(seed, int):
        return jax.random.PRNGKey(seed)
    if jnp.issubdtype(jnp.asarray(seed).dtype, jnp.integer):
        return jax.random.PRNGKey(seed)
    return seed


RadianceFn = Callable[..., jnp.ndarray]


def render(
    primitives: EllipsoidScene,
    camera: CameraSpecs,
    radiance_fn: RadianceFn,
    cfg: Any,
    emitter: Optional[envmap_ops.Emitter] = None,
    spp: int = 1,
    seed: Union[int, jax.Array] = 0,
    rfilter: str = "box",
    mesh=None,
    spp_group: int = 1,
) -> jnp.ndarray:
    """Render one camera. Returns [H, W, 3].

    ``radiance_fn(primitives, emitter, o, d, cfg, key) -> [R, 3]``.
    With ``mesh``, the ray wavefront is sharded over the mesh's data axis.

    ``spp_group`` folds that many samples into ONE wavefront per scan
    step (rays stacked on the batch axis). The estimator is unchanged —
    per-ray counter RNG draws independent variates across the folded
    batch; g=1 keeps the original key path bitwise. Measured on TPU
    (round 5): prb cost is ray-LINEAR, so grouping does not speed the
    smoke spp-64 workload (9953 ms at g=4 vs 9559 ungrouped) — the knob
    remains for workloads whose per-dispatch overhead dominates (very
    small films). Memory scales with the group.
    """
    h, w = camera.height, camera.width
    splat = filters.splat_tent if rfilter == "tent" else filters.splat_box
    base_key = _as_key(seed)
    g = max(1, min(int(spp_group), spp))
    while spp % g:
        g -= 1

    def body(film: Film, i: jnp.ndarray) -> tuple[Film, None]:
        pxs, pys, keys = [], [], []
        for j in range(g):
            key = jax.random.fold_in(base_key, i * g + j)
            kf, kr = jax.random.split(key)
            px_j, py_j = _film_coords(camera, kf, jitter=True)
            pxs.append(px_j)
            pys.append(py_j)
            keys.append(kr)
        px = jnp.concatenate(pxs)
        py = jnp.concatenate(pys)
        o, d = rays_from_pixels(camera, px, py)
        if mesh is not None:
            from ..parallel.mesh import shard_rays

            o, d = shard_rays(mesh, o, d)
        # one folded key: radiance_fns consume the key per-RAY (fold_in /
        # threefry counters over the ray index), so distinct rays draw
        # independent variates; the per-sample kf jitters already differ.
        kr_all = keys[0] if g == 1 else jax.random.fold_in(base_key, -i - 1)
        radiance = radiance_fn(primitives, emitter, o, d, cfg, kr_all)
        img, wgt = splat(radiance, px, py, w, h)
        return Film(film.img + img, film.wgt + wgt), None

    film0 = Film(jnp.zeros((h, w, 3), jnp.float32), jnp.zeros((h, w), jnp.float32))
    film, _ = jax.lax.scan(body, film0, jnp.arange(spp // g))
    return film.develop()


def render_batch(
    primitives: EllipsoidScene,
    cameras: Sequence[CameraSpecs],
    radiance_fn: RadianceFn,
    cfg: Any,
    emitter: Optional[envmap_ops.Emitter] = None,
    spp: int = 1,
    seed: Union[int, jax.Array] = 0,
    rfilter: str = "box",
    mesh=None,
) -> jnp.ndarray:
    """Render N same-resolution cameras side by side into one wide image —
    the reference's ``batch`` sensor (examples/optimize_volume.py:167-177),
    which is its data-parallel-over-views axis. Returns [H, N*W, 3].

    All cameras render in one wavefront, so the ray batch can be sharded
    across a device mesh (see volprim_tpu.parallel).
    """
    h, w = cameras[0].height, cameras[0].width
    for c in cameras:
        assert (c.height, c.width) == (h, w), "batch sensor needs equal films"
    n = len(cameras)
    splat = filters.splat_tent if rfilter == "tent" else filters.splat_box
    base_key = _as_key(seed)

    # Stack per-camera constants; ray-gen vectorizes over the camera axis.
    rot = jnp.asarray(
        np.stack([c.to_world[:3, :3] for c in cameras]), jnp.float32
    )
    origin = jnp.asarray(
        np.stack([c.to_world[:3, 3] for c in cameras]), jnp.float32
    )
    focal = jnp.asarray([c.focal_length for c in cameras], jnp.float32)
    ppx = jnp.asarray([c.width / 2.0 - c.cx for c in cameras], jnp.float32)
    ppy = jnp.asarray([c.height / 2.0 - c.cy for c in cameras], jnp.float32)

    def gen_rays(px, py):
        # px, py: [N, R] per-camera film coords.
        dl = jnp.stack(
            [
                -(px - ppx[:, None]) / focal[:, None],
                -(py - ppy[:, None]) / focal[:, None],
                jnp.ones_like(px),
            ],
            axis=-1,
        )  # [N, R, 3]
        d = jnp.einsum("nij,nrj->nri", rot, dl)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(origin[:, None, :], d.shape)
        return o.reshape(-1, 3), d.reshape(-1, 3)

    r = h * w
    px0 = jnp.tile(jnp.arange(w, dtype=jnp.float32)[None, :], (h, 1)).reshape(-1)
    py0 = jnp.tile(jnp.arange(h, dtype=jnp.float32)[:, None], (1, w)).reshape(-1)

    def body(film: Film, i: jnp.ndarray) -> tuple[Film, None]:
        key = jax.random.fold_in(base_key, i)
        kf, kr = jax.random.split(key)
        off = jax.random.uniform(kf, (n, r, 2))
        px = px0[None, :] + off[..., 0]
        py = py0[None, :] + off[..., 1]
        o, d = gen_rays(px, py)
        if mesh is not None:
            from ..parallel.mesh import shard_rays

            o, d = shard_rays(mesh, o, d)
        radiance = radiance_fn(primitives, emitter, o, d, cfg, kr)
        # Splat into the concatenated wide film: camera i occupies columns
        # [i*w, (i+1)*w).
        wide_px = (px + jnp.arange(n, dtype=jnp.float32)[:, None] * w).reshape(-1)
        wide_py = py.reshape(-1)
        img, wgt = splat(radiance, wide_px, wide_py, n * w, h)
        return Film(film.img + img, film.wgt + wgt), None

    film0 = Film(
        jnp.zeros((h, n * w, 3), jnp.float32), jnp.zeros((h, n * w), jnp.float32)
    )
    film, _ = jax.lax.scan(body, film0, jnp.arange(spp))
    return film.develop()


def render_with_spp_grad(
    camera: CameraSpecs,
    radiance_fn: RadianceFn,
    cfg: Any,
    emitter: Optional[envmap_ops.Emitter] = None,
    spp: int = 8,
    spp_grad: int = 1,
    seed: Union[int, jax.Array] = 0,
    rfilter: str = "box",
    mesh=None,
):
    """Primal/adjoint sample-count split — ``mi.render(..., spp,
    spp_grad)`` semantics (the reference optimizes with ref_spp-quality
    primals but 1-spp adjoints, examples/optimize_volume.py:233).

    Returns ``f(primitives) -> [H, W, 3]`` whose forward pass renders with
    ``spp`` samples while its VJP re-renders with ``spp_grad`` samples (the
    same base seed, so ``spp_grad == spp`` reproduces plain AD exactly).
    ``camera`` may be a list of cameras (the batch sensor, render_batch).
    """
    rfn = render_batch if isinstance(camera, (list, tuple)) else render

    def primal(p):
        return rfn(
            p, camera, radiance_fn, cfg, emitter, spp=spp, seed=seed,
            rfilter=rfilter, mesh=mesh,
        )

    def adjoint(p):
        return rfn(
            p, camera, radiance_fn, cfg, emitter, spp=spp_grad, seed=seed,
            rfilter=rfilter, mesh=mesh,
        )

    @jax.custom_vjp
    def f(p):
        return primal(p)

    def fwd(p):
        return primal(p), p

    def bwd(p, g):
        _, vjp = jax.vjp(adjoint, p)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f
