"""Per-stage timing of the tiled rf frame on the bench workload.

Splits the bench frame (512^2, spp=2, 262k splats, fused backend) into:

  full     the whole render_state frame (bench.py's measurement)
  nokernel the frame with the Pallas compositor stubbed out (cull + pack +
           gathers + resort + refine plumbing; the stub keeps data
           dependencies on pf/sh/d8 so nothing is DCE'd)
  cull     the per-frame culling alone (two-level cone cull + shortlists)
  kernel   composite_tiles3 alone over pre-gathered tile blocks

so kernel-vs-pipeline time is attributed the same way VERDICT round 1
demanded ("a per-stage timing split printed"). Timing follows the axon
protocol (CLAUDE.md): fetch a scalar, vary the seed each rep, report min.

Usage: python tools/profile_rf.py [--reps 4] [--stages full,nokernel,...]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402  (bench.py scene builder)


def _timeit(fn, seeds, reps):
    import jax.numpy as jnp

    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(fn(jnp.int32(seeds + i)))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)), ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--stages", default="full,nokernel,cull,gather,kernel"
    )
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tile_pixels", type=int, default=256)
    ap.add_argument("--max_candidates", type=int, default=2048)
    ap.add_argument("--cluster_size", type=int, default=16)
    ap.add_argument("--refine", type=float, default=0.125)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--kernel_batch", type=int, default=1)
    ap.add_argument("--coarse_group", type=int, default=4)
    ap.add_argument("--coarse_factor", type=int, default=8)
    ap.add_argument("--super_group", type=int, default=4)
    ap.add_argument("--segment", type=int, default=0)
    ap.add_argument("--compact", action="store_true")
    ap.add_argument(
        "--classes", default="",
        help="budget classes 'frac:k,...' (bench.py BENCH_CLASSES syntax)",
    )
    ap.add_argument(
        "--feat_major", action="store_true",
        help="[F, T, S] kernel tables via middle-axis gathers (in_pack/"
        "in_gather time the relayout-free route WITHOUT a Mosaic compile)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import volprim_tpu as vp
    from volprim_tpu.accel import tiles as tiling
    from volprim_tpu.models import rf_tiled
    from volprim_tpu.pallas_kernels import composite3

    stages = args.stages.split(",")
    scene = bench.make_scene(262144)
    camera = vp.scene.CameraSpecs(
        name="bench", width=512, height=512,
        to_world=vp.scene.look_at([0, 0.4, -3.2], [0, 0, 0], [0, 1, 0]),
        fov=50.0,
    )
    classes = tuple(
        (float(p.split(":")[0]), int(p.split(":")[1]))
        for p in args.classes.split(",") if p
    )
    cfg = rf_tiled.RFTiledConfig(
        max_depth=128, tile_pixels=args.tile_pixels,
        max_candidates=args.max_candidates,
        segment=(args.segment or min(256, args.max_candidates)),
        cluster_size=args.cluster_size, backend="fused", early_exit=True,
        coarse_group=args.coarse_group,
        refine_fraction=0.0 if classes else args.refine,
        refine_factor=4, kernel_batch=args.kernel_batch,
        coarse_factor=args.coarse_factor, super_group=args.super_group,
        kernel_compact=args.compact, budget_classes=classes,
        feat_major=args.feat_major,
    )
    state = jax.jit(lambda p: rf_tiled.build_state(p, cfg))(scene)
    spp = args.spp
    results = {}

    def report(name, sec, ts):
        results[name] = sec * 1e3
        print(f"{name:10s} {sec * 1e3:8.1f} ms   (reps: "
              + ", ".join(f"{t * 1e3:.1f}" for t in ts) + ")", flush=True)

    if "full" in stages:
        fn = jax.jit(
            lambda s: jnp.sum(
                rf_tiled.render_state(state, camera, cfg, None, spp=spp,
                                      seed=s)
            )
        )
        float(fn(jnp.int32(0)))
        report("full", *_timeit(fn, 100, args.reps))

    if "in_cull_nosel" in stages:
        # cull with top-k selection stubbed out (first-k instead): the
        # difference to in_cull is the pure lax.top_k cost
        real_sl = tiling.shortlist
        rf_tiled._DEBUG_STOP = "cull"
        try:
            tiling.shortlist = lambda keys, k: (
                jnp.broadcast_to(
                    jnp.arange(k, dtype=jnp.int32),
                    keys.shape[:-1] + (k,),
                ),
                jnp.isfinite(keys[..., :k]),
            )
            fn = jax.jit(
                lambda s: jnp.sum(
                    rf_tiled.render_state(
                        state, camera, cfg, None, spp=spp, seed=s
                    )
                )
            )
            float(fn(jnp.int32(0)))
            report("in_cull_nosel", *_timeit(fn, 800, args.reps))
        finally:
            tiling.shortlist = real_sl
            rf_tiled._DEBUG_STOP = None

    # ---- in-frame stage stops (the real pipeline, stopped early) ---------
    for stop in ("cull", "pack", "gather_pf", "gather"):
        if f"in_{stop}" in stages:
            rf_tiled._DEBUG_STOP = stop
            try:
                fn = jax.jit(
                    lambda s: jnp.sum(
                        rf_tiled.render_state(
                            state, camera, cfg, None, spp=spp, seed=s
                        )
                    )
                )
                float(fn(jnp.int32(0)))
                report(f"in_{stop}", *_timeit(fn, 700, args.reps))
            finally:
                rf_tiled._DEBUG_STOP = None

    if "nokernel" in stages:
        real = composite3.composite_tiles3_ad

        def stub(d8, pf, sh3, n_seg_t, *a, **k):
            t, _, rt = d8.shape
            # cheap, but keeps pf/sh3/d8/n_seg_t alive as inputs
            l0 = (
                jnp.sum(pf, axis=(1, 2)) * 1e-12
                + jnp.sum(
                    sh3.astype(jnp.float32),
                    axis=tuple(range(1, sh3.ndim)),
                ) * 1e-12
                + jnp.sum(d8, axis=(1, 2)) * 1e-12
                + n_seg_t.astype(jnp.float32) * 1e-12
            )
            l = jnp.broadcast_to(l0[:, None, None], (t, rt, 3))
            return l, jnp.ones((t, rt), jnp.float32)

        composite3.composite_tiles3_ad = stub
        try:
            fn = jax.jit(
                lambda s: jnp.sum(
                    rf_tiled.render_state(state, camera, cfg, None, spp=spp,
                                          seed=s)
                )
            )
            float(fn(jnp.int32(0)))
            report("nokernel", *_timeit(fn, 200, args.reps))
        finally:
            composite3.composite_tiles3_ad = real

    # ---- shared geometry for the standalone stages -----------------------
    h = w = 512
    tp = cfg.tile_pixels
    th = int(tp ** 0.5)
    while tp % th or h % th:
        th -= 1
    tw = tp // th
    n_ty, n_tx = h // th, w // tw
    n_tiles = n_ty * n_tx
    origin = jnp.asarray(camera.to_world[:3, 3], jnp.float32)
    cs = cfg.cluster_size
    k_cl = max(1, cfg.max_candidates // cs)

    def cull(seed):
        """Two-level cone cull (same shapes as _render_tiles). Returns
        (cl_ids [T, K], cl_valid [T, K], axis [T, 3], d [T, RT, 3])."""
        o, d = vp.scene.generate_rays(camera, jitter=False)
        d = d + seed.astype(jnp.float32) * 1e-12
        d = d.reshape(n_ty, th, n_tx, tw, 3).transpose(0, 2, 1, 3, 4)
        d = d.reshape(n_tiles, tp, 3)
        ax = d.mean(axis=1)
        axis = ax / jnp.linalg.norm(ax, axis=-1, keepdims=True)
        cos_half = jnp.min(jnp.einsum("tri,ti->tr", d, axis), axis=1)
        gc = cfg.coarse_group
        n_coarse = n_tiles // gc
        ax_g = axis.reshape(n_coarse, gc, 3)
        c_axis = ax_g.mean(axis=1)
        c_axis = c_axis / jnp.linalg.norm(c_axis, axis=-1, keepdims=True)
        cosb = jnp.einsum("cgi,ci->cg", ax_g, c_axis)
        ang = jnp.arccos(jnp.clip(cosb, -1, 1)) + jnp.arccos(
            jnp.clip(cos_half.reshape(n_coarse, gc), -1, 1)
        )
        c_cos = jnp.cos(jnp.max(ang, axis=1))
        sg = state.super_group
        ncl_total = state.cull_centers.shape[0]
        keys_s = tiling.cone_cull_keys_batch(
            origin, c_axis, c_cos, state.sup_centers, state.sup_radii
        )
        k_sup = min(
            max(1, -(-cfg.coarse_factor * k_cl // sg)),
            state.sup_centers.shape[0],
        )
        sup_ids, sup_valid = tiling.shortlist(keys_s, k_sup)
        offs_s = jnp.arange(sg, dtype=sup_ids.dtype)
        cl_c = (sup_ids[..., None] * sg + offs_s).reshape(
            n_coarse, k_sup * sg
        )
        cl_cv = jnp.broadcast_to(
            sup_valid[..., None], (n_coarse, k_sup, sg)
        ).reshape(n_coarse, k_sup * sg) & (cl_c < ncl_total)
        cl_c = jnp.minimum(cl_c, ncl_total - 1)
        k_c = k_sup * sg
        ccx = state.cull_centers[:, 0][cl_c]
        ccy = state.cull_centers[:, 1][cl_c]
        ccz = state.cull_centers[:, 2][cl_c]
        ccr = jnp.where(cl_cv, state.cull_radii[cl_c], -1.0)
        rep_ = lambda a: jnp.repeat(a, gc, axis=0)
        keys = tiling.cone_cull_keys_cols(
            origin, axis, cos_half, rep_(ccx), rep_(ccy), rep_(ccz),
            rep_(ccr),
        )
        loc_ids, cl_valid = tiling.shortlist(keys, min(k_cl, k_c))
        cl_ids = jnp.take_along_axis(rep_(cl_c), loc_ids, axis=-1)
        return cl_ids, cl_valid, axis, d

    if "cull" in stages:
        def cull_sum(s):
            ci, cv, _, _ = cull(s)
            return jnp.sum(ci) + jnp.sum(cv)

        fn = jax.jit(cull_sum)
        float(fn(jnp.int32(0)))
        report("cull", *_timeit(fn, 300, args.reps))

    if "cull_coarse" in stages:
        # the coarse strip stage alone (keys + approx_max_k + argsort)
        def coarse_sum(s):
            o, d = vp.scene.generate_rays(camera, jitter=False)
            d = d + s.astype(jnp.float32) * 1e-12
            d = d.reshape(n_ty, th, n_tx, tw, 3).transpose(0, 2, 1, 3, 4)
            d = d.reshape(n_tiles, tp, 3)
            ax = d.mean(axis=1)
            axis = ax / jnp.linalg.norm(ax, axis=-1, keepdims=True)
            cos_half = jnp.min(
                jnp.einsum("tri,ti->tr", d, axis), axis=1
            )
            gc = cfg.coarse_group
            n_coarse = n_tiles // gc
            ax_g = axis.reshape(n_coarse, gc, 3)
            c_axis = ax_g.mean(axis=1)
            c_axis = c_axis / jnp.linalg.norm(
                c_axis, axis=-1, keepdims=True
            )
            cosb = jnp.einsum("cgi,ci->cg", ax_g, c_axis)
            ang = jnp.arccos(jnp.clip(cosb, -1, 1)) + jnp.arccos(
                jnp.clip(cos_half.reshape(n_coarse, gc), -1, 1)
            )
            c_cos = jnp.cos(jnp.max(ang, axis=1))
            keys_s = tiling.cone_cull_keys_batch(
                origin, c_axis, c_cos, state.sup_centers, state.sup_radii
            )
            k_sup = min(
                max(1, -(-cfg.coarse_factor * k_cl // state.super_group)),
                state.sup_centers.shape[0],
            )
            sup_ids, sup_valid = tiling.shortlist(keys_s, k_sup)
            return jnp.sum(sup_ids) + jnp.sum(sup_valid)

        fn = jax.jit(coarse_sum)
        float(fn(jnp.int32(0)))
        report("cull_coarse", *_timeit(fn, 600, args.reps))

    if "gather" in stages or "kernel" in stages:
        # real culled shortlists for one frame, gathered once
        ci, cv, axis_t, d_t = jax.jit(cull)(jnp.int32(0))
        ptab = composite3.pack_fused_features(state.prims, origin)
        ncl = state.prims.num_prims // cs
        s_here = k_cl * cs
        neutral = composite3.neutral_fused_row()

        ptab_rows = (
            ptab.reshape(16, ncl, cs).transpose(1, 0, 2).reshape(ncl, 16 * cs)
        )

        def gather(ci, cv, seed):
            ci = ci + (seed - seed)  # seed-dependence for the timer
            valid_row = jnp.repeat(cv, cs, axis=-1)
            rows = jnp.take(
                ptab_rows, ci.reshape(-1), axis=0, mode="clip"
            )
            pf_t = (
                rows.reshape(n_tiles, k_cl, 16, cs)
                .transpose(0, 2, 1, 3)
                .reshape(n_tiles, 16, s_here)
            )
            pf_t = jnp.where(
                valid_row[:, None, :], pf_t, neutral[None, :, None]
            )
            k_live = state.prims.sh_coeffs_3d().shape[1]
            sh_small = jnp.take(
                state.shrows, ci.reshape(-1), axis=0, mode="clip"
            )
            sh_t = (
                sh_small.reshape(n_tiles, k_cl, 3 * k_live, cs)
                .transpose(0, 2, 1, 3)
                .reshape(n_tiles, 3 * k_live, s_here)
            )
            return pf_t, sh_t

        if "gather" in stages:
            def gather_sum(s):
                pf_t, sh_t = gather(ci, cv, s)
                return jnp.sum(pf_t) + jnp.sum(sh_t.astype(jnp.float32))

            fn = jax.jit(gather_sum)
            float(fn(jnp.int32(0)))
            report("gather", *_timeit(fn, 500, args.reps))

    if "kernel" in stages:
        pf_t, sh_t = jax.jit(lambda: gather(ci, cv, jnp.int32(0)))()
        n_seg_t = -(-(jnp.sum(cv, axis=-1) * cs) // cfg.segment)
        d8 = jnp.concatenate(
            [
                d_t.transpose(0, 2, 1),
                jnp.zeros((n_tiles, 5, tp), jnp.float32),
            ],
            axis=1,
        )

        # arrays as ARGUMENTS (closure constants inflate the remote-compile
        # request past the axon helper's body-size limit: HTTP 413)
        def kern(seed, d8, pf_t, sh_t, n_seg_t):
            d8s = d8 + seed.astype(jnp.float32) * 1e-12
            l, beta = composite3.composite_tiles3(
                d8s, pf_t, sh_t, n_seg_t, cfg.segment, 9.0, 128, 0.01, 1, 4,
                True, True, jax.default_backend() == "cpu",
                args.kernel_batch,
            )
            return jnp.sum(l) + jnp.sum(beta)

        jfn = jax.jit(kern)
        fn = lambda s: jfn(s, d8, pf_t, sh_t, n_seg_t)
        float(fn(jnp.int32(0)))
        report("kernel", *_timeit(fn, 400, args.reps))

    for abl in ("nodepth", "noemis", "notrans", "nocum", "noop", "noop2", "static", "fori"):
        if f"abl_{abl}" in stages:
            composite3._ABL = frozenset([abl])
            # composite_tiles3 is a module-level jit: _ABL is not in its
            # cache key, so stale traces would silently measure the REAL
            # kernel. Clear jit caches (the XLA disk cache still dedups
            # recompiles of previously seen ablations).
            jax.clear_caches()
            try:
                jfn_a = jax.jit(kern)
                fn_a = lambda s: jfn_a(s, d8, pf_t, sh_t, n_seg_t)
                float(fn_a(jnp.int32(0)))
                report(f"abl_{abl}", *_timeit(fn_a, 450, args.reps))
            finally:
                composite3._ABL = frozenset()
                jax.clear_caches()

    if "clone" in stages:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _ckern(ns_ref, d_ref, pf_ref, sh_ref, ut_ref, o_ref):
            v = (
                ns_ref[0, pl.program_id(0)].astype(jnp.float32)
                + d_ref[0, 0, 0]
                + pf_ref[0, 0, 0]
                + sh_ref[0, 0:1, 0:128].astype(jnp.float32)[0, 0]
                + ut_ref[0, 0]
            )
            o_ref[...] = jnp.zeros(o_ref.shape, jnp.float32) + v

        def clone(seed, d8, pf_t, sh_t, n_seg_t):
            t = pf_t.shape[0]
            seg = cfg.segment
            y = pl.pallas_call(
                _ckern,
                grid=(t,),
                in_specs=[
                    pl.BlockSpec((1, t), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 8, d8.shape[2]), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, 16, pf_t.shape[2]),
                                 lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, sh_t.shape[1], sh_t.shape[2]),
                                 lambda i: (i, 0, 0)),
                    pl.BlockSpec((seg, seg), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, d8.shape[2], 8), lambda i: (i, 0, 0)
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (t, d8.shape[2], 8), jnp.float32
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(
                n_seg_t.astype(jnp.int32).reshape(1, t),
                d8 + seed.astype(jnp.float32) * 1e-12, pf_t, sh_t,
                jnp.triu(jnp.ones((seg, seg), jnp.float32)),
            )
            return jnp.sum(y)

        jclone = jax.jit(clone)
        fnc = lambda s: jclone(s, d8, pf_t, sh_t, n_seg_t)
        float(fnc(jnp.int32(0)))
        report("clone", *_timeit(fnc, 350, args.reps))

    if "segstats" in stages:
        if "kernel" not in stages:
            raise SystemExit("segstats needs the kernel stage data")
        raw = jax.jit(
            lambda: composite3._forward3(
                d8, pf_t, sh_t, n_seg_t, cfg.segment, 9.0, 128, 0.01, 1, 4,
                True, True, jax.default_backend() == "cpu",
                args.kernel_batch,
            )
        )()
        walked = np.asarray(raw[:, 0, 4])
        live = np.asarray(raw[:, 0, 5])
        beta = np.asarray(raw[..., 3])
        unsat = (beta > 0.01).mean(axis=1)
        print(
            f"segstats: walked mean {walked.mean():.2f} p50"
            f" {np.percentile(walked, 50):.0f} p90"
            f" {np.percentile(walked, 90):.0f} max {walked.max():.0f} |"
            f" live mean {live.mean():.2f} | walked/live"
            f" {walked.sum() / max(live.sum(), 1):.2%} |"
            f" unsat rays/tile mean {unsat.mean():.2%}",
            flush=True,
        )

    print("summary:", {k: round(v, 1) for k, v in results.items()},
          flush=True)


if __name__ == "__main__":
    main()
