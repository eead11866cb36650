"""Measurement study for round-3 rf budget redesign (run on TPU).

Questions answered on the bench workload (512^2, 262k splats):
  1. Per-tile cluster-need distribution: how many clusters intersect each
     tile cone (n_finite), and how skewed is it vs the fixed k_cl budget?
  2. Where is the mc2048 -> mc4096 quality gap concentrated, and does
     n_finite (or the posterior truncation signals) predict those tiles?
  3. Subtile cull survival: if each 8x8 quarter of a 16x16 tile walked only
     the clusters passing ITS cone, what fraction of pairs remain?

Usage: python tools/analyze_rf.py [--cpu] [--tp 256] [--mc 2048]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tp", type=int, default=256)
    ap.add_argument("--mc", type=int, default=2048)
    ap.add_argument("--cs", type=int, default=16)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import volprim_tpu as vp
    from volprim_tpu.accel import tiles as tiling
    from volprim_tpu.models import rf_tiled

    scene = bench.make_scene(262144)
    camera = vp.scene.CameraSpecs(
        name="bench", width=512, height=512,
        to_world=vp.scene.look_at([0, 0.4, -3.2], [0, 0, 0], [0, 1, 0]),
        fov=50.0,
    )

    def mkcfg(mc, tp=args.tp):
        return rf_tiled.RFTiledConfig(
            max_depth=128, tile_pixels=tp, max_candidates=mc,
            segment=min(256, mc), cluster_size=args.cs, backend="fused",
            early_exit=True, coarse_group=4, refine_fraction=0.0,
            refine_factor=4, kernel_batch=4, coarse_factor=8, super_group=4,
        )

    cfg = mkcfg(args.mc)
    state = jax.jit(lambda p: rf_tiled.build_state(p, cfg))(scene)

    h = w = 512
    tp = args.tp
    th = int(tp ** 0.5)
    while tp % th or h % th:
        th -= 1
    tw = tp // th
    n_ty, n_tx = h // th, w // tw
    n_tiles = n_ty * n_tx
    origin = jnp.asarray(camera.to_world[:3, 3], jnp.float32)
    k_cl = args.mc // args.cs

    # ---- tile cones + exact per-tile finite-cluster counts ---------------
    def tile_geom():
        o, d = vp.scene.generate_rays(camera, jitter=False)
        d = d.reshape(n_ty, th, n_tx, tw, 3).transpose(0, 2, 1, 3, 4)
        d = d.reshape(n_tiles, tp, 3)
        ax = d.mean(axis=1)
        axis = ax / jnp.linalg.norm(ax, axis=-1, keepdims=True)
        cos_half = jnp.min(jnp.einsum("tri,ti->tr", d, axis), axis=1)
        return d, axis, cos_half

    def nfin_counts():
        d, axis, cos_half = tile_geom()
        # exact cull against ALL clusters (analysis only; the real pipeline
        # goes through strips): count finite keys per tile
        keys = tiling.cone_cull_keys_batch(
            origin, axis, cos_half, state.cull_centers, state.cull_radii
        )
        return jnp.sum(jnp.isfinite(keys), axis=-1)

    n_fin = np.asarray(jax.jit(nfin_counts)())
    q = np.percentile(n_fin, [10, 50, 90, 99])
    print(
        f"n_finite clusters/tile (k_cl budget {k_cl}): mean {n_fin.mean():.0f}"
        f" p10 {q[0]:.0f} p50 {q[1]:.0f} p90 {q[2]:.0f} p99 {q[3]:.0f}"
        f" max {n_fin.max()} | tiles over budget: {(n_fin > k_cl).mean():.1%}"
        f" | sum {n_fin.sum()} vs budget sum {k_cl * n_tiles}",
        flush=True,
    )

    # ---- subtile survival ------------------------------------------------
    def subtile_survival():
        o, d = vp.scene.generate_rays(camera, jitter=False)
        sh_, sw_ = th // 2, tw // 2
        d = d.reshape(n_ty, 2, sh_, n_tx, 2, sw_, 3)
        d = d.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
            n_tiles * 4, sh_ * sw_, 3
        )
        ax = d.mean(axis=1)
        axis = ax / jnp.linalg.norm(ax, axis=-1, keepdims=True)
        cos_half = jnp.min(jnp.einsum("tri,ti->tr", d, axis), axis=1)
        keys = tiling.cone_cull_keys_batch(
            origin, axis, cos_half, state.cull_centers, state.cull_radii
        )
        return jnp.sum(jnp.isfinite(keys), axis=-1)

    n_fin_sub = np.asarray(jax.jit(subtile_survival)())
    per_tile_sub = n_fin_sub.reshape(n_tiles, 4)
    surv = per_tile_sub.sum(axis=1) / np.maximum(4 * n_fin, 1)
    print(
        f"subtile(8x8) survival of tile clusters: mean"
        f" {surv[n_fin > 8].mean():.1%} (tiles with n_fin>8);"
        f" subtile n_fin mean {n_fin_sub.mean():.0f}"
        f" p90 {np.percentile(n_fin_sub, 90):.0f}"
        f" | pair ratio subtile/tile"
        f" {n_fin_sub.sum() / max(4 * n_fin.sum(), 1):.2f}",
        flush=True,
    )

    # ---- prim-level survival inside culled-in clusters -------------------
    # The in-kernel compaction candidate: a column (prim) can be skipped
    # when its bounding sphere misses the tile/subtile cone. How many
    # survive?
    prim_r = float(state.prims.extent) * jnp.max(state.prims.scales, axis=-1)

    def prim_survival(sub: bool):
        o, d = vp.scene.generate_rays(camera, jitter=False)
        if sub:
            sh_, sw_ = th // 2, tw // 2
            d = d.reshape(n_ty, 2, sh_, n_tx, 2, sw_, 3)
            d = d.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
                n_tiles * 4, sh_ * sw_, 3
            )
        else:
            d = d.reshape(n_ty, th, n_tx, tw, 3).transpose(0, 2, 1, 3, 4)
            d = d.reshape(n_tiles, tp, 3)
        ax = d.mean(axis=1)
        axis = ax / jnp.linalg.norm(ax, axis=-1, keepdims=True)
        cos_half = jnp.min(jnp.einsum("tri,ti->tr", d, axis), axis=1)
        # tile-level culled clusters (same for the 4 subtiles of a tile)
        o0, d0 = vp.scene.generate_rays(camera, jitter=False)
        dt = d0.reshape(n_ty, th, n_tx, tw, 3).transpose(0, 2, 1, 3, 4)
        dt = dt.reshape(n_tiles, tp, 3)
        axt = dt.mean(axis=1)
        axist = axt / jnp.linalg.norm(axt, axis=-1, keepdims=True)
        cos_halft = jnp.min(jnp.einsum("tri,ti->tr", dt, axist), axis=1)
        keys = tiling.cone_cull_keys_batch(
            origin, axist, cos_halft, state.cull_centers, state.cull_radii
        )
        k_cov = 512  # covers the max observed need
        cl_ids, cl_valid = tiling.shortlist(keys, k_cov)
        if sub:
            cl_ids = jnp.repeat(cl_ids, 4, axis=0)
            cl_valid = jnp.repeat(cl_valid, 4, axis=0)
        cs = state.cluster_size
        pids = (
            cl_ids[..., None] * cs + jnp.arange(cs, dtype=cl_ids.dtype)
        ).reshape(cl_ids.shape[0], k_cov * cs)
        pval = jnp.repeat(cl_valid, cs, axis=-1)
        px = state.prims.centers[:, 0][pids]
        py = state.prims.centers[:, 1][pids]
        pz = state.prims.centers[:, 2][pids]
        pr = jnp.where(pval, prim_r[pids], -1.0)
        pkeys = tiling.cone_cull_keys_cols(
            origin, axis, cos_half, px, py, pz, pr
        )
        live = jnp.sum(jnp.isfinite(pkeys), axis=-1)
        tot = jnp.sum(pval, axis=-1)
        return live, tot

    live_t, tot_t = jax.jit(lambda: prim_survival(False))()
    live_s, tot_s = jax.jit(lambda: prim_survival(True))()
    lt, tt = np.asarray(live_t), np.asarray(tot_t)
    ls = np.asarray(live_s)
    print(
        f"prim-in-cluster survival: tile {lt.sum() / max(tt.sum(), 1):.1%}"
        f" (live/tile mean {lt.mean():.0f} of {tt.mean():.0f});"
        f" subtile(8x8) {ls.sum() / max(4 * tt.sum(), 1):.1%}"
        f" (live/subtile mean {ls.mean():.0f})",
        flush=True,
    )

    # ---- quality attribution --------------------------------------------
    import os

    exact_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "tests", "golden", "bench_exact512.npy",
    )
    if not os.path.exists(exact_path):
        print("no exact golden; skipping quality attribution", flush=True)
        return
    exact = np.load(exact_path).astype(np.float32)

    def render(mc):
        c = mkcfg(mc)
        st = jax.jit(lambda p: rf_tiled.build_state(p, c))(scene)
        return np.asarray(
            jax.jit(
                lambda s: rf_tiled.render_state(
                    st, camera, c, None, spp=1, seed=s, jitter=False
                )
            )(jnp.int32(0))
        )

    img_base = render(args.mc)
    img_big = render(4 * args.mc)

    def per_tile_mse(img):
        e = (img - exact) ** 2
        e = e.reshape(n_ty, th, n_tx, tw, 3).transpose(0, 2, 1, 3, 4)
        return e.reshape(n_tiles, -1).mean(axis=1)

    mse_b = per_tile_mse(img_base)
    mse_g = per_tile_mse(img_big)
    delta = mse_b - mse_g  # quality recoverable with 4x budget
    tot = delta.sum()
    order = np.argsort(-delta)
    csum = np.cumsum(delta[order]) / max(tot, 1e-12)
    for frac in (0.05, 0.125, 0.25, 0.5):
        m = int(n_tiles * frac)
        print(
            f"top {frac:.0%} tiles hold {csum[m - 1]:.0%} of the"
            " recoverable MSE",
            flush=True,
        )

    def psnr(img):
        return -10 * np.log10(max(np.mean((img - exact) ** 2), 1e-12))

    print(
        f"PSNR vs exact: mc{args.mc} {psnr(img_base):.2f} dB |"
        f" mc{4 * args.mc} {psnr(img_big):.2f} dB",
        flush=True,
    )

    # do the available signals find those tiles?
    rank_need = np.argsort(-delta)
    for name, sig in (
        ("n_finite", n_fin.astype(np.float64)),
        ("n_fin_over_budget", np.maximum(n_fin - k_cl, 0).astype(np.float64)),
    ):
        sel = np.argsort(-sig)[: n_tiles // 8]
        hit = delta[sel].sum() / max(tot, 1e-12)
        print(
            f"signal {name}: top-12.5% tiles capture {hit:.0%} of"
            " recoverable MSE",
            flush=True,
        )
    np.savez(
        "/tmp/rf_need.npz", n_fin=n_fin, n_fin_sub=n_fin_sub, mse_b=mse_b,
        mse_g=mse_g,
    )


if __name__ == "__main__":
    main()
