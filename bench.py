"""Headline benchmark: tiled volprim_rf Mrays/sec on a 3DGS-like scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: a *trained-3DGS-like surface scene* — 262,144 thin anisotropic
splats tangent to three blobby objects plus a ground sheet, opacities and
degree-1 SH in trained ranges. This matches the geometry class of the
reference's own benchmark (``render_3dg_asset.py`` over a trained
3DGS asset like truck.ply, whose opacity concentrates on surfaces; the
actual dataset blobs are stripped from the snapshot). 512x512 film, spp=2,
max_depth=128 (the render_3dg_asset.py defaults).

Quality gate: PSNR against a stored *exact-order per-ray* render of the
same frame (tests/golden/bench_exact512.npy, produced by the exact
integrator models/rf.py on this scene — regenerate with
BENCH_REGEN_EXACT=1, ~4 min on the TPU). The headline config's agreement
with exact ray tracing (~25-26 dB) matches the published gap between 3DGS
tile rasterization and exact ray tracing (3DGRT reports ~23-27 dB on
trained scenes) — i.e. the speed is bought with the industry-standard
ordering approximation, not with extra truncation. A 2x-shortlist PSNR is
also printed to separate truncation from ordering. A volumetric fog
variant (round-1's scene) remains available via BENCH_SCENE=fog — note
that a random isotropic fog needs thousands of composited primitives per
ray and is closer to a participating-media workload than to the trained
3DGS assets the reference benchmarks.

The reference repo publishes no numbers (BASELINE.md: harness only), so
vs_baseline is reported against a 100 Mrays/sec/chip proxy (a mid-range
published 3DGRT-class GPU figure) until a measured Dr.Jit-CUDA baseline
exists.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np


_partial_started = False


def _details_path() -> str:
    """BENCH_DETAILS destination; BENCH_DETAILS_PATH redirects a trial run
    (tools/autotune.py) away from the canonical repo-root file."""
    return os.environ.get("BENCH_DETAILS_PATH") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json"
    )


def _apply_tuning() -> None:
    """Fold BENCH_TUNING.json (repo root) into the environment.

    The file records flag flips DECIDED ON HARDWARE by tools/autotune.py
    (e.g. BENCH_FM=1 after the feat_major A/B wins) so a later driver-run
    bench executes the best measured configuration even when no builder
    session is around to flip defaults. Explicit environment variables
    always win over the file; delete the file to fall back to built-ins."""
    path = os.environ.get("BENCH_TUNING_PATH") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_TUNING.json"
    )
    if not os.path.exists(path):
        return
    try:
        with open(path) as f:
            tuning = json.load(f)
    except Exception as e:
        print(f"bench: ignoring unreadable BENCH_TUNING.json: {e}",
              file=sys.stderr)
        return
    applied = {}
    for k, v in tuning.items():
        if k.startswith("_") or not k.startswith(("BENCH_", "VOLPRIM_")):
            continue  # provenance fields / refuse foreign keys
        if k not in os.environ:
            os.environ[k] = str(v)
            applied[k] = str(v)
    if applied:
        print(f"bench: applied BENCH_TUNING.json: {applied}",
              file=sys.stderr)


def _emit_partial(section: dict) -> None:
    """Merge a finished bench section into BENCH_DETAILS.json immediately.

    The axon tunnel dies for hours at a time and the full run is hours of
    cold Mosaic compiles: without incremental writes a late-section death
    loses every number already measured (round 3 ended with rc=1 and no
    driver-verified details at all). The first write of a run REPLACES the
    file (never mixes rounds); the final complete write at the end of
    main() clears the _partial marker."""
    global _partial_started
    if os.environ.get("BENCH_NO_DETAILS", "0") == "1" or not section:
        return
    path = _details_path()
    data = {}
    if _partial_started and os.path.exists(path):
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            data = {}
    data.update(section)
    data["_partial"] = True
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    _partial_started = True


def _orient_quats(normals: np.ndarray, rng) -> np.ndarray:
    """Quats rotating local +z onto each normal, with random spin."""
    n = normals / np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-9)
    z = np.array([0.0, 0.0, 1.0])
    # quaternion from z to n: axis = z x n, w = 1 + z.n
    axis = np.cross(np.broadcast_to(z, n.shape), n)
    w = 1.0 + n[:, 2:3]
    q = np.concatenate([axis, w], axis=1)
    # degenerate (n = -z): rotate around x
    bad = w[:, 0] < 1e-6
    q[bad] = [1.0, 0.0, 0.0, 0.0]
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # random spin about the normal
    ang = rng.uniform(0, np.pi, size=(n.shape[0], 1))
    spin = np.concatenate(
        [np.sin(ang) * n, np.cos(ang)], axis=1
    )
    # quaternion product spin * q  (x,y,z,w layout)
    x1, y1, z1, w1 = spin.T
    x2, y2, z2, w2 = q.T
    out = np.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=1,
    )
    return out.astype(np.float32)


def make_scene(n_prims: int, kind: str = "surface"):
    import jax.numpy as jnp

    import volprim_tpu as vp

    rng = np.random.default_rng(0)
    if kind == "fog":
        n_vol = (3 * n_prims) // 4
        vol = np.stack(
            [
                rng.uniform(-2, 2, size=n_vol),
                rng.uniform(-1, 1, size=n_vol),
                rng.uniform(-2, 2, size=n_vol),
            ],
            axis=-1,
        )
        n_g = n_prims - n_vol
        ground = np.stack(
            [
                rng.uniform(-3, 3, size=n_g),
                np.full(n_g, -1.0) + rng.normal(size=n_g) * 0.02,
                rng.uniform(-3, 3, size=n_g),
            ],
            axis=-1,
        )
        centers = np.concatenate([vol, ground]).astype(np.float32)
        quats = rng.normal(size=(n_prims, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        scales = rng.uniform(0.004, 0.016, size=(n_prims, 3)).astype(np.float32)
    else:  # trained-3DGS-like surface scene
        n_ground = n_prims // 4
        n_obj = n_prims - n_ground
        # ground sheet on y = -1
        gx = rng.uniform(-3, 3, size=n_ground)
        gz = rng.uniform(-3, 3, size=n_ground)
        gy = np.full(n_ground, -1.0) + rng.normal(size=n_ground) * 0.005
        g_centers = np.stack([gx, gy, gz], axis=-1)
        g_normals = np.tile([0.0, 1.0, 0.0], (n_ground, 1))
        g_normals += rng.normal(size=(n_ground, 3)) * 0.05
        # three blobby objects (bumpy spheres)
        obj_centers, obj_normals = [], []
        params = [([-1.1, -0.25, 0.3], 0.75), ([1.0, -0.1, -0.2], 0.9),
                  ([0.0, 0.35, 1.0], 0.65)]
        per = n_obj // len(params)
        for (c, r0) in params:
            m = per
            dirs = rng.normal(size=(m, 3))
            dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
            # bumpy radius: low-frequency lobes
            bump = 1.0 + 0.18 * np.sin(4.1 * dirs[:, 0] + 1.2) * np.cos(
                3.3 * dirs[:, 1]
            ) + 0.12 * np.sin(5.7 * dirs[:, 2])
            pts = np.asarray(c) + dirs * (r0 * bump[:, None])
            obj_centers.append(pts)
            obj_normals.append(dirs)
        rem = n_obj - per * len(params)
        if rem:
            obj_centers.append(obj_centers[0][:rem])
            obj_normals.append(obj_normals[0][:rem])
        centers = np.concatenate([g_centers] + obj_centers).astype(np.float32)
        normals = np.concatenate([g_normals] + obj_normals).astype(np.float32)
        quats = _orient_quats(normals, rng)
        # Thin tangent splats sized for trained-3DGS-like surface coverage
        # (~3-5 splats overlap any surface point): sigma such that
        # density * pi * (2 sigma)^2 ~ 4 for each region.
        sig = np.empty((n_prims,), np.float64)
        sig[:n_ground] = np.sqrt(4.0 / (n_ground / 36.0) / np.pi) / 2.0
        sig[n_ground:] = np.sqrt(4.0 / (n_obj / 30.0) / np.pi) / 2.0
        tangent = sig[:, None] * np.exp(
            rng.normal(0.0, 0.3, size=(n_prims, 2))
        )
        normal_s = tangent[:, :1] * rng.uniform(0.08, 0.25, size=(n_prims, 1))
        scales = np.concatenate([tangent, normal_s], axis=1).astype(np.float32)

    f_dc = rng.normal(size=(n_prims, 3)).astype(np.float32) * 0.3
    f_rest = rng.normal(size=(n_prims, 9)).astype(np.float32) * 0.1
    return vp.scene.EllipsoidScene(
        centers=jnp.asarray(centers),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        attrs={
            "opacities": jnp.asarray(
                rng.uniform(0.55, 0.99, size=(n_prims, 1)).astype(np.float32)
            ),
            "sh_coeffs": jnp.asarray(np.concatenate([f_dc, f_rest], axis=1)),
        },
    )


def bench_2m(jax, jnp, vp, rf_tiled, cfg):
    """Truck-class scale demonstration (VERDICT round-2 #3): a 2M-splat
    surface scene rendered through rf_tiled. Reports Mrays/s, HBM
    highwater, and PSNR vs the exact-order integrator on a 4096-ray
    subsample.

    The 2M config diverges from the headline where the round-3 CPU
    attribution showed the headline settings MEASURE WRONG at 8x density
    (all numbers vs a max_depth=512 exact reference on the same rays):

    - max_depth=512 (BENCH_2M_MD): ray hit counts reach 218 (p99=86), so
      the 128 cap truncated the deepest ~1% of rays differently in the
      reference and the tiled walk. max_depth is a traced kernel scalar,
      so this costs no Mosaic compile.
    - coarse_factor=16 (BENCH_2M_CF): uncapped per-tile need reaches
      1917 clusters (p90=1024); the headline pool of cf8*128=1024
      candidates truncates 10% of tiles before budgets even apply.
    - classes 0.3:128,0.2:384,0.25:512,0.25:1024 (BENCH_2M_CLASSES):
      fitted to the 2M need distribution (10.8% of need truncated, avg
      budget 499); budget 1024 is the single new kernel variant. Deeper
      ladders buy almost nothing: the tiled-vs-exact ceiling at 2M is
      ~25.9 dB (zero-truncation mc64k + md512 + per-prim resort,
      CPU-vs-CPU), set by the shared-axis ordering approximation at 8x
      overlap density, not truncation (resort +0.4 dB, mc64k +0.2 dB;
      f32 noise floor 101 dB by the permuted-prims test).
    - the golden is regenerated (versioned bench2m_exact_d512.npz) ON
      THE TPU: cross-platform f32 divergence of this scene class is
      26.5 dB at 2M / 36 dB at 262k (CPU exact@128 vs the TPU golden@128
      — identical algorithm), so a CPU-made golden would poison a
      TPU-measured metric. The old 20.8 dB (TPU vs TPU golden, platform
      cancelled) was headline-ladder truncation + pool below the
      ordering ceiling.
    """
    import time as _time

    # BENCH_2M_N / BENCH_2M_RES: smoke knobs (see main(); non-default
    # sizes keep their exact reference under /tmp, never in tests/golden)
    n2m = int(os.environ.get("BENCH_2M_N", "2097152"))
    res2 = int(os.environ.get("BENCH_2M_RES", "512"))
    scene2 = make_scene(n2m)
    camera = vp.scene.CameraSpecs(
        name="bench2m", width=res2, height=res2,
        to_world=vp.scene.look_at([0, 0.4, -3.2], [0, 0, 0], [0, 1, 0]),
        fov=50.0,
    )
    md2 = int(os.environ.get("BENCH_2M_MD", "512"))
    cf2 = int(os.environ.get("BENCH_2M_CF", "16"))
    cls2 = os.environ.get(
        "BENCH_2M_CLASSES", "0.3:128,0.2:384,0.25:512,0.25:1024"
    )
    repl = dict(max_depth=md2, coarse_factor=cf2)
    if cls2 != "headline" and cfg.budget_classes:
        repl["budget_classes"] = tuple(
            (float(p.split(":")[0]), int(p.split(":")[1]))
            for p in cls2.split(",") if p
        )
    # round-5 quality levers toward the ~25.9 dB 2M ordering ceiling:
    # - BENCH_2M_CSORT (default 0 — MEASURED BAD TRADE at 2M): the
    #   per-frame permute of the [16, Ncl, cs] + [Ncl, 3k*cs] tables is
    #   ~0.3 GB of HBM shuffle at 131k clusters: hardware measured
    #   6.99 -> 5.50 Mrays (-21%) for +0.15 dB. (At 262k the same knob
    #   costs 2.4% for +0.84 dB and is ON via BENCH_TUNING.)
    # - BENCH_2M_BAND (opt-in CSV, e.g. "0,0,0,16"): per-class banding —
    #   bands only the listed classes; each banded (tile-count, S) pair
    #   is a FRESH Mosaic variant, so warm it via a queue job before any
    #   driver bench.
    if os.environ.get("BENCH_2M_CSORT", "0") == "1":
        repl["cluster_sort"] = True
    band2 = os.environ.get("BENCH_2M_BAND", "")
    if band2:
        repl["band_classes"] = tuple(
            int(v) for v in band2.split(",") if v != ""
        )
    cfg = dataclasses.replace(cfg, **repl)
    state = jax.jit(lambda p: rf_tiled.build_state(p, cfg))(scene2)
    spp = 2

    def run_block(st, seed0):
        def body(acc, i):
            img = rf_tiled.render_state(
                st, camera, cfg, None, spp=spp, seed=seed0 + i
            )
            return acc + jnp.sum(img), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(4))
        return acc

    jfn = jax.jit(run_block)
    float(jfn(state, jnp.int32(0)))
    dev = jax.devices()[0]
    try:
        hbm_peak = dev.memory_stats().get("peak_bytes_in_use", 0)
    except Exception:
        hbm_peak = 0
    if not hbm_peak:
        # memory_stats is unavailable through the axon tunnel: report an
        # analytic lower bound instead of a misleading 0 — resident state
        # (prims + packed SH rows + cull tables) plus the largest
        # transient (the deepest class's gathered pf/sh tile blocks + the
        # per-frame [16, N] pack + kernel output).
        def nbytes(tree):
            return sum(
                x.size * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(tree)
                if hasattr(x, "size")
            )

        resident = nbytes(state)
        kmax = max(k for _, k in cfg.budget_classes) if (
            cfg.budget_classes
        ) else cfg.max_candidates // cfg.cluster_size
        n_t = (res2 // 16) ** 2
        frac = (
            max(f for f, k in cfg.budget_classes
                if k == kmax) if cfg.budget_classes else 1.0
        )
        tb = max(1, int(round(n_t * frac)))
        s_max = kmax * cfg.cluster_size
        transient = (
            tb * s_max * (16 * 4 + 12 * 2)  # gathered pf f32 + sh bf16
            + 16 * scene2.num_prims * 4     # per-frame pack table
            + tb * 256 * 8 * 4              # kernel out [Tb, RT, 8]
        )
        hbm_peak = resident + transient
    times = []
    for i in range(3):
        t0 = _time.perf_counter()
        float(jfn(state, jnp.int32(100 * (i + 1))))
        times.append(_time.perf_counter() - t0)
    exec_s = float(np.min(times)) / 4
    mrays = res2 * res2 * spp / exec_s / 1e6

    # PSNR vs exact per-ray order on a fixed 4096-ray subsample
    img1 = np.asarray(
        jax.jit(
            lambda st, s: rf_tiled.render_state(
                st, camera, cfg, None, spp=1, seed=s, jitter=False
            )
        )(state, jnp.int32(0))
    ).reshape(-1, 3)
    # golden versioned by the reference hit cap: the md=128 file
    # (bench2m_exact.npz) is KNOWN WRONG on the ~1% deepest rays (hit
    # counts reach 218) — it disagrees with exact@512 by 26.5 dB
    if n2m == 2097152 and res2 == 512:
        gpath = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tests", "golden",
            "bench2m_exact.npz" if md2 == 128
            else f"bench2m_exact_d{md2}.npz",
        )
    else:  # smoke sizes keep their reference out of tests/golden
        gpath = f"/tmp/bench2m_exact_n{n2m}_r{res2}_d{md2}.npz"
    rng = np.random.default_rng(42)
    sel = rng.choice(res2 * res2, size=min(4096, res2 * res2 // 4), replace=False)
    if os.environ.get("BENCH_REGEN_EXACT") == "1" or not os.path.exists(
        gpath
    ):
        from volprim_tpu.models import rf as rf_exact

        o_r, d_r = vp.scene.generate_rays(camera, jitter=False)
        ecfg = rf_exact.RFConfig(
            max_depth=md2, srgb_primitives=True, chunk_size=4096
        )
        jex = jax.jit(
            lambda o_, d_: rf_exact.radiance(
                scene2, None, o_, d_, ecfg, jax.random.PRNGKey(0)
            )
        )
        exact_sub = np.asarray(jex(o_r[sel], d_r[sel]))
        np.savez(gpath, sel=sel, exact=exact_sub.astype(np.float16))
    g = np.load(gpath)
    assert (g["sel"] == sel).all()
    sub = img1[sel]
    fin_frac = float(np.isfinite(sub).mean())
    if fin_frac < 1.0:
        # diagnose rather than poison the metric: report the nan fraction
        # and compute PSNR over the finite pixels
        print(
            f"2M tiled render non-finite fraction: {1 - fin_frac:.4f}",
            file=sys.stderr,
        )
    m = np.isfinite(sub).all(axis=-1)
    mse = float(
        np.mean((sub[m] - g["exact"].astype(np.float32)[m]) ** 2)
    )
    psnr = -10 * np.log10(max(mse, 1e-12))
    print(
        f"2M-splat scene: {mrays:.2f} Mrays/s, frame {exec_s * 1e3:.1f} ms,"
        f" HBM peak {hbm_peak / 2**30:.2f} GiB,"
        f" PSNR vs exact (4096-ray subsample) {psnr:.1f} dB",
        file=sys.stderr,
    )
    out = {
        "rf_2M_mrays": round(mrays, 3),
        "rf_2M_psnr_vs_exact_db": round(psnr, 2),
        "rf_2M_hbm_peak_gib": round(hbm_peak / 2**30, 3),
        "rf_2M_config": (
            f"md{md2}_cf{cf2}_cls{cls2}"
            + ("_csort" if cfg.cluster_sort else "")
            + (f"_band{band2}" if band2 else "")
        ),
    }

    # Quality row: full per-tile ENTRY-distance resort before packing —
    # XLA-side only (prim_resort is a render-time knob; zero new Mosaic
    # variants, same state) and the closest measured point to the 2M
    # shared-axis ceiling (CPU probes: entry resort 26.10 dB at zero
    # truncation vs csort 25.67; the ladder's 10.8% truncation sits on
    # top). Costs a per-frame argsort of every tile shortlist (262k
    # headline measured it at 17.4 -> 10.3 Mrays) — reported with its own
    # throughput so the tradeoff is explicit.
    resort_mode = os.environ.get("BENCH_2M_RESORT", "entry")
    if resort_mode:
        try:
            cfg_r = dataclasses.replace(cfg, prim_resort=resort_mode)

            def run_block_r(st, seed0):
                def body(acc, i):
                    img = rf_tiled.render_state(
                        st, camera, cfg_r, None, spp=spp, seed=seed0 + i
                    )
                    return acc + jnp.sum(img), None
                acc, _ = jax.lax.scan(
                    body, jnp.float32(0.0), jnp.arange(4)
                )
                return acc

            jfr = jax.jit(run_block_r)
            float(jfr(state, jnp.int32(0)))
            rts = []
            for i in range(3):
                t0 = _time.perf_counter()
                float(jfr(state, jnp.int32(300 * (i + 1))))
                rts.append(_time.perf_counter() - t0)
            exec_r = float(np.min(rts)) / 4
            img_r = np.asarray(
                jax.jit(
                    lambda st, s: rf_tiled.render_state(
                        st, camera, cfg_r, None, spp=1, seed=s,
                        jitter=False,
                    )
                )(state, jnp.int32(0))
            ).reshape(-1, 3)
            sub_r = img_r[sel]
            m_r = np.isfinite(sub_r).all(axis=-1)
            mse_r = float(np.mean(
                (sub_r[m_r] - g["exact"].astype(np.float32)[m_r]) ** 2
            ))
            psnr_r = -10 * np.log10(max(mse_r, 1e-12))
            mrays_r = res2 * res2 * spp / exec_r / 1e6
            out.update({
                "rf_2M_resort_mrays": round(mrays_r, 3),
                "rf_2M_resort_psnr_vs_exact_db": round(psnr_r, 2),
                "rf_2M_resort_mode": resort_mode,
            })
            print(
                f"2M quality row (prim_resort={resort_mode}): "
                f"{mrays_r:.2f} Mrays/s at {psnr_r:.2f} dB vs exact",
                file=sys.stderr,
            )
        except Exception as e:  # keep the primary 2M metrics alive
            print(f"2M resort quality row failed: {e}", file=sys.stderr)

    return out


def bench_prb_cluster_1m(jax, jnp, vp):
    """prb free flight at 1M primitives. The BRUTE chunk scan is the
    declared scaling design (round-5 decision, VERDICT r4 #2b): the
    round-4 hardware A/B measured the cluster-gathering path 7x SLOWER
    than brute at this scale (11,949 vs 1,720 ms, BENCH_r04) with 25%
    kill disagreement — per-element gathers at ~5 ns/element lose to
    regular GEMM chunk scans up to (at least) 1M prims. This bench now

    - times the brute design point,
    - quantifies the budget-kill bias against a need-sized GOLDEN
      (collect_budget >= the measured max per-ray interval count, so the
      golden budget-kills ~nothing — the reference's march is uncapped by
      default, common.py:448-459), and
    - keeps the demoted cluster path as an opt-in experiment
      (BENCH_PRB1M_CLUSTER=1) so its A/B stats stay measurable."""
    import time as _time

    from volprim_tpu.models import prb as prb_mod

    smoke = vp.scene.load_ply("/root/reference/resources/smoke.ply")
    n0 = smoke.num_prims
    # BENCH_PRB1M_N: smoke knob (see main())
    target = int(os.environ.get("BENCH_PRB1M_N", "1048576"))
    reps = -(-target // n0)  # 835-prim smoke -> 1.05M primitives
    rng = np.random.default_rng(3)
    offs = rng.uniform(-3.0, 3.0, size=(reps, 3)).astype(np.float32)
    offs[0] = 0.0
    import jax.numpy as jnp_

    centers = (
        smoke.centers[None, :, :] + jnp_.asarray(offs)[:, None, :]
    ).reshape(-1, 3)
    big = vp.scene.EllipsoidScene(
        centers=centers,
        scales=jnp_.tile(smoke.scales, (reps, 1)),
        quats=jnp_.tile(smoke.quats, (reps, 1)),
        attrs={
            k: jnp_.tile(v, (reps, 1)) for k, v in smoke.attrs.items()
        },
        extent=smoke.extent,
    )
    n = big.num_prims
    r = 1024
    o = jnp_.tile(jnp_.asarray([[0.0, 0.0, -6.0]]), (r, 1))
    ang = jnp_.asarray(
        np.stack(
            [
                rng.uniform(-0.4, 0.4, r), rng.uniform(-0.4, 0.4, r),
                np.ones(r),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    d = ang / jnp_.linalg.norm(ang, axis=-1, keepdims=True)
    xi = jnp_.asarray(rng.uniform(1e-6, 1.0, r).astype(np.float32))
    act = jnp_.ones((r,), bool)

    cfg_br = prb_mod.PRBConfig(
        max_overlaps=8, max_windows=16, collect_budget=128,
        use_clusters=False, chunk_size=4096,
    )

    def ff(cfg, idx, seed):
        oo = o + seed.astype(jnp_.float32) * 1e-12
        found, dead, ts, alb, s1, s2 = prb_mod.free_flight(
            big, oo, d, xi, cfg, act, index=idx
        )
        return found, ts, dead

    j_br = jax.jit(lambda s: ff(cfg_br, None, s))
    f_br, t_br, d_br = j_br(jnp_.int32(0))
    f_br = np.asarray(f_br)
    t_br = np.asarray(t_br)
    d_br_np = np.asarray(d_br)
    kill_br = float(d_br_np.mean())

    def timeit(fn):
        ts_ = []
        for i in range(3):
            t0 = _time.perf_counter()
            r_ = fn(jnp_.int32(i + 1))
            float(jnp_.sum(r_[1], where=jnp_.isfinite(r_[1])))
            ts_.append(_time.perf_counter() - t0)
        return float(np.min(ts_)) * 1e3

    ms_br = timeit(j_br)

    # ---- budget-kill bias vs a need-sized golden -------------------------
    # Golden: collect_budget >= max measured per-ray interval count (and
    # max_windows sized to consume it), so the golden path budget-kills
    # essentially nothing — a stand-in for the reference's uncapped march.
    # Timed once for the record (it is the honesty cost, not a design
    # point); the bias numbers are what matter.
    # The golden must also cover the scene's simultaneous open-interval
    # DEPTH: a window advances only while <= max_overlaps intervals are
    # open, so depth > max_overlaps stalls the walk into the no-progress
    # kill (measured: the first hardware golden at max_overlaps=32 still
    # killed 57% of rays at 1M; a 60k CPU probe shows open depth p90=26 /
    # max=50 and mo=64 kills 0). Size it from a measured event sweep over
    # a full collection, capped at 256 ([R, 2K-1, K] walk memory).
    cfg_sz = prb_mod.suggest_budgets(
        big, o, d,
        dataclasses.replace(cfg_br, max_overlaps=32),
        percentile=100.0, sample_rays=r,
    )
    e_pr, x_pr, *_ = prb_mod._collect_intervals(big, None, o, d, cfg_sz)
    e_np, x_np = np.asarray(e_pr), np.asarray(x_pr)
    depth_max = 0
    for i in range(e_np.shape[0]):
        fin = np.isfinite(e_np[i])
        if not fin.any():
            continue
        ts = np.concatenate([e_np[i][fin], x_np[i][fin]])
        sg = np.concatenate(
            [np.ones(fin.sum(), np.int32), -np.ones(fin.sum(), np.int32)]
        )
        ordr = np.argsort(ts, kind="stable")
        depth_max = max(depth_max, int(np.cumsum(sg[ordr]).max()))
    mo_g = int(min(256, max(32, 1 << int(np.ceil(np.log2(depth_max + 1))))))
    cfg_g = prb_mod.suggest_budgets(
        big, o, d,
        dataclasses.replace(cfg_br, max_overlaps=mo_g),
        percentile=100.0, sample_rays=r,
    )
    j_g = jax.jit(lambda s: ff(cfg_g, None, s))
    f_g, t_g, d_g = j_g(jnp_.int32(0))
    f_g, t_g, d_g = np.asarray(f_g), np.asarray(t_g), np.asarray(d_g)
    kill_g = float(d_g.mean())
    live_both = ~d_br_np & ~d_g
    agree_live = (
        float((f_br == f_g)[live_both].mean()) if live_both.any() else 1.0
    )
    both = f_br & f_g
    t_rel = float(
        np.max(np.abs(t_br[both] - t_g[both]) / np.maximum(t_g[both], 1e-6))
    ) if both.any() else 0.0
    killed = d_br_np & ~d_g
    # What the budgeted path throws away: among its killed rays, the
    # fraction the golden scatters (vs escapes) — the actual bias content
    # of the max_depth_primitive-style kill.
    killed_found = float(f_g[killed].mean()) if killed.any() else 0.0

    out = {
        "prb_1M_brute_ms": round(ms_br, 1),
        "prb_1M_kill_frac_brute": round(kill_br, 4),
        "prb_1M_golden_budget": int(cfg_g.collect_budget),
        "prb_1M_golden_overlaps": mo_g,
        "prb_1M_open_depth_max": depth_max,
        "prb_1M_golden_kill_frac": round(kill_g, 4),
        "prb_1M_live_agreement_vs_golden": round(agree_live, 4),
        "prb_1M_t_rel_vs_golden": float(f"{t_rel:.3e}"),
        "prb_1M_killed_found_frac": round(killed_found, 4),
    }
    print(
        f"prb 1M-prim free flight ({n} prims, {r} rays): brute scan"
        f" {ms_br:.0f} ms (the declared scaling design), kill frac"
        f" {kill_br:.2%}; golden (budget {cfg_g.collect_budget}) kill"
        f" frac {kill_g:.2%}, live agreement {agree_live:.1%}, max rel t"
        f" diff {t_rel:.2e}; {killed_found:.1%} of budget-killed rays"
        f" would scatter under the golden",
        file=sys.stderr,
    )

    # ---- demoted cluster-path experiment (opt-in) ------------------------
    if os.environ.get("BENCH_PRB1M_CLUSTER") == "1":
        cfg_cl = dataclasses.replace(
            cfg_br, use_clusters=True, cluster_size=32,
        )
        index = prb_mod.build_ff_index(big, cfg_cl)
        j_cl = jax.jit(lambda s: ff(cfg_cl, index, s))
        f_cl, t_cl, d_cl = j_cl(jnp_.int32(0))
        f_cl, t_cl = np.asarray(f_cl), np.asarray(t_cl)
        d_cl_np = np.asarray(d_cl)
        ms_cl = timeit(j_cl)
        live = ~d_cl_np & ~d_br_np
        out.update({
            "prb_1M_cluster_ms": round(ms_cl, 1),
            "prb_1M_kill_frac_cluster": round(float(d_cl_np.mean()), 4),
            "prb_1M_kill_disagreement": round(
                float((d_cl_np != d_br_np).mean()), 4
            ),
            "prb_1M_live_agreement": round(
                float((f_cl == f_br)[live].mean()) if live.any() else 1.0, 4
            ),
        })
        print(
            f"prb 1M cluster experiment: {ms_cl:.0f} ms vs brute"
            f" {ms_br:.0f} ms", file=sys.stderr,
        )
    return out


def _probe_backend(timeout_s: int = 600) -> None:
    """Fail fast if the pinned backend cannot run a trivial op.

    The axon tunnel dies for hours at a time, and when it is down the
    in-process device init HANGS (no error) — a driver-invoked bench then
    burns its whole timeout budget discovering nothing. Probe in a
    subprocess with a hard timeout before touching jax in-process; a dead
    tunnel exits rc=3 within ``timeout_s`` with a clear message. Bypass
    with BENCH_SKIP_PROBE=1 (the probe itself costs one extra device init
    when the backend is healthy, ~seconds)."""
    if os.environ.get("BENCH_SKIP_PROBE", "0") == "1" or (
        os.environ.get("BENCH_FORCE_CPU", "0") == "1"
    ):
        return
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "print(jax.devices());"
        "assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        print(
            f"bench: backend probe HUNG >{timeout_s}s (axon tunnel down?) "
            "— aborting before in-process device init.",
            file=sys.stderr,
        )
        sys.exit(3)
    if r.returncode != 0:
        print(
            "bench: backend probe FAILED (tunnel down / backend error):\n"
            + (r.stderr or "")[-2000:],
            file=sys.stderr,
        )
        sys.exit(3)
    print(f"bench: backend probe OK: {r.stdout.strip()}", file=sys.stderr)


def main():
    _apply_tuning()

    import jax

    # The env-level JAX_PLATFORMS pin ignores os.environ overrides; the
    # in-process config update is the only way to force CPU (CLAUDE.md).
    # Smoke/validation runs (tools/autotune.py --dry, bench smoke) use it.
    if os.environ.get("BENCH_FORCE_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import volprim_tpu as vp
    from volprim_tpu.models import rf_tiled

    # BENCH_N / BENCH_RES: smoke knobs — shrink the scene/film so every
    # section's Python path can run end-to-end off-TPU (CPU interpret)
    # before an expensive queued hardware run. Defaults unchanged;
    # non-default sizes never touch the checked-in goldens.
    n_prims = int(os.environ.get("BENCH_N", "262144"))
    width = height = int(os.environ.get("BENCH_RES", "512"))
    spp = 2
    kind = os.environ.get("BENCH_SCENE", "surface")

    scene = make_scene(n_prims, kind)
    camera = vp.scene.CameraSpecs(
        name="bench", width=width, height=height,
        to_world=vp.scene.look_at([0, 0.4, -3.2], [0, 0, 0], [0, 1, 0]),
        fov=50.0,
    )

    # Headline config (overridable via BENCH_* envs for sweeps):
    # tp256/mc2048/cg4(2x2 strips)/cf8/sg4 measures 26.0 dB vs the exact
    # per-ray-order golden at 10.6 Mrays/s; tp64/mc2048/cg16 reaches
    # 29.1 dB at 6.4 Mrays/s (4x gather duplication), tp64/mc512 15.5 dB
    # at 18.9 Mrays/s. The default is the middle point whose quality
    # matches the published 3DGS-raster-vs-raytrace gap.
    tp = int(os.environ.get("BENCH_TP", "256"))
    cs = int(os.environ.get("BENCH_CS", "16"))
    cg = int(os.environ.get("BENCH_CG", "4"))
    kb = int(os.environ.get("BENCH_KB", "4"))
    mc0 = int(os.environ.get("BENCH_MC", "2048"))
    seg0 = int(os.environ.get("BENCH_SEG", "256"))
    rf0 = float(os.environ.get("BENCH_REFINE", "0.125"))
    cf0 = int(os.environ.get("BENCH_CF", "8"))
    sg0 = int(os.environ.get("BENCH_SG", "4"))
    # adaptive per-tile budget classes: "frac:k_clusters,frac:k,..."
    # Defaults (round 3): in-kernel column compaction + need-matched
    # budget classes — the measured quality/speed winner (16.5 Mrays/s at
    # 30.2 dB-vs-exact pre-thinning; see BENCH_DETAILS.json). "none"
    # disables classes; BENCH_COMPACT=0 disables compaction.
    # 5 tiers fitted to the measured need distribution (mean 152 / p90 294
    # / max 465 clusters per tile) beat 3 tiers by 1.7 Mrays at identical
    # 30.2 dB (q6d: 18.0 vs 16.3): average static budget 224 vs 262.
    cls_env = os.environ.get(
        "BENCH_CLASSES", "0.35:128,0.3:192,0.2:288,0.1:384,0.05:512"
    )
    if cls_env == "none":
        cls_env = ""
    classes0 = tuple(
        (float(p.split(":")[0]), int(p.split(":")[1]))
        for p in cls_env.split(",") if p
    )
    compact0 = os.environ.get("BENCH_COMPACT", "1") == "1"
    # BENCH_FM=1: feature-major kernel tables ([F, T, S] via middle-axis
    # gathers, no relayouts). New Mosaic variants per budget class — only
    # flip after the in-frame gather timing justifies the compiles.
    fm0 = os.environ.get("BENCH_FM", "0") == "1"
    # BENCH_CSORT=1: pack-time intra-cluster depth sort — +0.74 dB at
    # 262k zero truncation for one global [Ncl, cs] argsort + table
    # permute per frame (measured on the CPU xla probe). round-5: works
    # in BOTH layouts (decoupled from feat_major); no new Mosaic variant
    # — data permute only. Autotune owns the flip decision.
    csort0 = os.environ.get("BENCH_CSORT", "0") == "1"
    # BENCH_RESORT=1: per-primitive depth resort of the gathered tables
    # along the tile axis (the fused default composites in cluster-gather
    # order; the exact-order ceiling is ordering-limited at ~31 dB)
    resort0 = os.environ.get("BENCH_RESORT", "0") == "1" or None

    def build(mc, refine=rf0, classes=classes0):
        cfg = rf_tiled.RFTiledConfig(
            max_depth=128, tile_pixels=tp, max_candidates=mc,
            segment=min(seg0, mc), cluster_size=cs, backend="fused",
            early_exit=True, coarse_group=cg,
            refine_fraction=0.0 if classes else refine,
            refine_factor=4, kernel_batch=kb, coarse_factor=cf0,
            super_group=sg0, budget_classes=classes,
            kernel_compact=compact0, prim_resort=resort0,
            feat_major=fm0, cluster_sort=csort0,
        )
        state = jax.jit(lambda p: rf_tiled.build_state(p, cfg))(scene)
        return cfg, state

    cfg, state = build(mc0)

    def run(st, seed):
        img = rf_tiled.render_state(st, camera, cfg, None, spp=spp, seed=seed)
        return img, jnp.sum(img)

    # Throughput: K frames per dispatch (seeds vary per frame inside the
    # scan, so neither the remote memoization nor XLA CSE can collapse
    # them). A single dispatch through the axon tunnel carries a ~26 ms
    # fixed round-trip (measured on a trivial jit fn) that is NOT device
    # time — amortizing it over K frames measures the chip, not the tunnel.
    k_frames = int(os.environ.get("BENCH_FRAMES", "8"))

    def run_block(st, seed0):
        def body(acc, i):
            img = rf_tiled.render_state(
                st, camera, cfg, None, spp=spp, seed=seed0 + i
            )
            return acc + jnp.sum(img), None
        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(k_frames)
        )
        return acc

    print(f"compiling on {jax.devices()[0]} ...", file=sys.stderr)
    t0 = time.perf_counter()
    jfn = jax.jit(run)
    out, chk = jfn(state, jnp.int32(0))
    float(chk)  # force execution (block_until_ready is unreliable over axon)
    print(f"compile+first: {time.perf_counter() - t0:.1f} s", file=sys.stderr)
    assert np.isfinite(np.asarray(out)).all()

    # single-frame dispatch latency (includes the tunnel round trip)
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        # vary the seed so remote-execution memoization cannot fire
        float(jfn(state, jnp.int32(i + 1))[1])
        times.append(time.perf_counter() - t0)
    lat_s = float(np.min(times))

    jblock = jax.jit(run_block)
    float(jblock(state, jnp.int32(0)))
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        float(jblock(state, jnp.int32(1000 * (i + 1))))
        times.append(time.perf_counter() - t0)
    exec_s = float(np.min(times)) / k_frames
    n_rays = width * height * spp
    mrays = n_rays / exec_s / 1e6

    # ---- quality gates ----------------------------------------------------
    img1 = np.asarray(
        jax.jit(
            lambda st, s: rf_tiled.render_state(
                st, camera, cfg, None, spp=1, seed=s, jitter=False
            )
        )(state, jnp.int32(0))
    )
    psnr_exact = float("nan")
    # Non-default (smoke) sizes regenerate their own exact reference under
    # /tmp — the checked-in golden is platform-matched to the TPU and must
    # only ever be (re)written at the canonical size on the bench platform.
    default_size = n_prims == 262144 and width == 512
    exact_path = (
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tests", "golden", "bench_exact512.npy",
        )
        if default_size
        else f"/tmp/bench_exact_n{n_prims}_r{width}.npy"
    )
    if kind == "surface":
        if os.environ.get("BENCH_REGEN_EXACT") == "1" or not os.path.exists(
            exact_path
        ):
            from volprim_tpu.models import rf as rf_exact

            o_r, d_r = vp.scene.generate_rays(camera, jitter=False)
            ecfg = rf_exact.RFConfig(
                max_depth=128, srgb_primitives=True, chunk_size=2048
            )
            jex = jax.jit(
                lambda o_, d_: rf_exact.radiance(
                    scene, None, o_, d_, ecfg, jax.random.PRNGKey(0)
                )
            )
            n_r = width * height
            csz = min(65536, n_r)
            outs = [
                np.asarray(jex(o_r[i:i + csz], d_r[i:i + csz]))
                for i in range(0, n_r, csz)
            ]
            np.save(
                exact_path,
                np.concatenate(outs)
                .reshape(height, width, 3)
                .astype(np.float16),
            )
        exact = np.load(exact_path).astype(np.float32)
        mse_e = float(np.mean((img1 - exact) ** 2))
        psnr_exact = -10 * np.log10(max(mse_e, 1e-12))
    cfg2, state2 = build(
        2 * mc0, refine=0.0,
        classes=tuple((f, 2 * k) for f, k in classes0),
    )
    img2 = np.asarray(
        jax.jit(
            lambda st, s: rf_tiled.render_state(
                st, camera, cfg2, None, spp=1, seed=s, jitter=False
            )
        )(state2, jnp.int32(0))
    )
    mse = float(np.mean((img1 - img2) ** 2))
    psnr2x = -10 * np.log10(max(mse, 1e-12))

    # ---- per-ray ordering quality mode (round-4 directive #3) -------------
    # order_band: banded per-ray entry-order correction inside the fused
    # kernel — the route PAST the shared-axis ordering ceiling (~31.1 dB at
    # 262k). Each point trades the class ladder for ONE single budget
    # (one Mosaic variant per mc, not five): kernel_compact keeps the walk
    # proportional to surviving columns, cluster_sort (feat_major) fixes
    # intra-cluster order at pack time, the band fixes the residual
    # cross-cluster inversions per ray. CPU probe vs platform-matched
    # exact (tools/band262k.py): mc4096 30.20 -> csort+band16 31.96 dB;
    # mc8192+csort+band16 33.49 dB (near-zero truncation). mc4096 runs
    # FIRST: it is the candidate for the ">=31.5 dB at >12 Mrays" bar, so
    # it must land even if the tunnel dies mid-bench.
    band_stats = {}
    band_points = os.environ.get("BENCH_BAND_POINTS", "16:4096,16:8192")
    if band_points and kind == "surface":
        for pt_i, pt in enumerate(band_points.split(",")):
            try:
                band0, bmc = (int(v) for v in pt.split(":"))
                bcfg = rf_tiled.RFTiledConfig(
                    max_depth=128, tile_pixels=tp, max_candidates=bmc,
                    segment=min(seg0, bmc), cluster_size=cs,
                    backend="fused", early_exit=True, coarse_group=cg,
                    refine_fraction=0.0, refine_factor=4, kernel_batch=kb,
                    coarse_factor=cf0, super_group=sg0, budget_classes=(),
                    # round-5: cluster_sort no longer needs feat_major
                    # (rf_tiled decoupling) — the band rows drop the fm
                    # layout, whose gathers measured +8 ms/frame on
                    # hardware (r4 verdict weak #6).
                    kernel_compact=True, feat_major=False,
                    cluster_sort=True, order_band=band0,
                )
                bstate = jax.jit(
                    lambda p, c=bcfg: rf_tiled.build_state(p, c)
                )(scene)

                def run_block_band(st, seed0, c=bcfg):
                    def body(acc, i):
                        img = rf_tiled.render_state(
                            st, camera, c, None, spp=spp, seed=seed0 + i
                        )
                        return acc + jnp.sum(img), None
                    acc, _ = jax.lax.scan(
                        body, jnp.float32(0.0), jnp.arange(k_frames)
                    )
                    return acc

                jbb = jax.jit(run_block_band)
                float(jbb(bstate, jnp.int32(0)))
                bts = []
                for i in range(4):
                    t0 = time.perf_counter()
                    float(jbb(bstate, jnp.int32(2000 * (i + 1))))
                    bts.append(time.perf_counter() - t0)
                band_s = float(np.min(bts)) / k_frames
                band_mrays = n_rays / band_s / 1e6
                imgb = np.asarray(
                    jax.jit(
                        lambda st, s, c=bcfg: rf_tiled.render_state(
                            st, camera, c, None, spp=1, seed=s,
                            jitter=False,
                        )
                    )(bstate, jnp.int32(0))
                )
                mse_b = float(np.mean((imgb - exact) ** 2))
                band_psnr = -10 * np.log10(max(mse_b, 1e-12))
                # the first (criterion) point keeps the legacy keys
                sfx = "" if pt_i == 0 else f"_mc{bmc}"
                band_stats.update({
                    f"rf_band_mrays{sfx}": round(band_mrays, 3),
                    f"rf_band_psnr_vs_exact_db{sfx}": round(band_psnr, 2),
                    f"rf_band_config{sfx}":
                        f"band{band0}_mc{bmc}_csort_compact",
                })
                _emit_partial(dict(band_stats))
                print(
                    f"order-band quality mode (band {band0}, mc {bmc}): "
                    f"{band_mrays:.2f} Mrays/s at {band_psnr:.2f} dB "
                    "vs exact",
                    file=sys.stderr,
                )
            except Exception as e:  # keep the headline metric alive
                print(
                    f"order-band quality metric ({pt}) failed: {e}",
                    file=sys.stderr,
                )

    stage = {
        "frame_ms": round(exec_s * 1e3, 1),
        "dispatch_latency_ms": round(lat_s * 1e3, 1),
        "frames_per_dispatch": k_frames,
    }

    print(
        f"exec {exec_s * 1e3:.1f} ms for {n_rays} rays over {n_prims} prims "
        f"({mrays:.2f} Mrays/s); PSNR vs exact ray order {psnr_exact:.1f} dB"
        f" (3DGS-raster-vs-raytrace class); vs 2x shortlist {psnr2x:.1f} dB;"
        f" stages {stage}",
        file=sys.stderr,
    )
    _emit_partial(
        {
            "rf_mrays": round(mrays, 3),
            "rf_psnr_vs_2x_shortlist_db": round(psnr2x, 2),
            "stages": stage,
            **band_stats,
            **(
                {"rf_psnr_vs_exact_db": round(psnr_exact, 2)}
                if np.isfinite(psnr_exact) else {}
            ),
        }
    )

    # ---- training-step metric (fused forward + custom-VJP backward) ------
    train_stats = {}
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        try:
            tcfg = rf_tiled.RFTiledConfig(
                max_depth=128, tile_pixels=tp, max_candidates=mc0,
                segment=min(seg0, mc0), cluster_size=cs, backend="fused",
                # the fused backend stays differentiable with early exit:
                # composite_tiles3_ad's custom-VJP backward re-walks the
                # live segments itself (only the XLA backend's while_loop
                # would break reverse-mode)
                early_exit=True,
                coarse_group=cg, coarse_factor=cf0, super_group=sg0,
                kernel_batch=kb, refine_fraction=0.0,
                kernel_compact=compact0, feat_major=fm0,
            )
            params = dict(
                centers=scene.centers, scales=scene.scales,
                quats=scene.quats, opacities=scene.attrs["opacities"],
                sh=scene.attrs["sh_coeffs"],
            )
            ref_img = jnp.zeros((height, width, 3))

            def loss_fn(p, seed):
                sc = vp.scene.EllipsoidScene(
                    centers=p["centers"], scales=p["scales"],
                    quats=p["quats"],
                    attrs={
                        "opacities": p["opacities"], "sh_coeffs": p["sh"],
                    },
                )
                st = rf_tiled.build_state(sc, tcfg)
                img = rf_tiled.render_state(
                    st, camera, tcfg, None, spp=1, seed=seed
                )
                return jnp.mean(jnp.abs(img - ref_img))

            tstep = jax.jit(jax.value_and_grad(loss_fn))
            l0, g0 = tstep(params, jnp.int32(0))
            assert np.isfinite(float(l0))
            assert all(
                np.isfinite(np.asarray(v)).all() for v in g0.values()
            )
            tts = []
            for i in range(3):
                t0 = time.perf_counter()
                float(tstep(params, jnp.int32(i + 1))[0])
                tts.append(time.perf_counter() - t0)
            train_s = float(np.min(tts))
            train_stats = {"rf_train_step_ms": round(train_s * 1e3, 1)}
            print(
                f"train step (512^2x1spp fwd+bwd+build): "
                f"{train_s * 1e3:.0f} ms",
                file=sys.stderr,
            )
        except Exception as e:  # keep the headline metric alive
            print(f"train-step metric failed: {e}", file=sys.stderr)
    _emit_partial(train_stats)

    # ---- smoke-PRB metric (BASELINE config #3, the other headline half) --
    prb_stats = {}
    if os.environ.get("BENCH_PRB", "1") != "0":
        try:
            from volprim_tpu import models as vmodels
            from volprim_tpu.models import prb as prb_mod

            smoke = vp.scene.load_ply("/root/reference/resources/smoke.ply")
            smoke.attrs["sigma_t"] = smoke.attrs["sigma_t"] * 10.0
            sky = vp.ops.envmap.procedural_sky()
            # BENCH_PRB_RES: smoke knob (see main()); default matches the
            # reference render_volume film
            pres = int(os.environ.get("BENCH_PRB_RES", "256"))
            pcam = vp.scene.CameraSpecs(
                name="prb", width=pres, height=pres,
                to_world=vp.scene.look_at(
                    [-4.0, -0.3, 0.0], [0, 0, 0], [0, 1, 0]
                ),
                fov=40.0,
            )
            # Adaptive per-bounce caps (round 3): bounce 0 crosses the whole
            # medium (full capacity); scattered bounces resolve in far fewer
            # intervals — tail caps cut collection + walk capacity. Disable
            # with BENCH_PRB_TAIL=0 for the round-2-equivalent estimator.
            tail_on = os.environ.get("BENCH_PRB_TAIL", "1") != "0"
            pcfg = prb_mod.PRBConfig(
                max_depth=-1, bounce_cap=32, max_overlaps=8, max_windows=16,
                collect_budget=128, use_clusters=False,
                # 4x fewer (sort-bound) collection merges at smoke scale
                chunk_size=4096,
                tail_after=1 if tail_on else 1,
                tail_windows=6 if tail_on else 0,
                tail_budget=48 if tail_on else 0,
                # diagnostics: BENCH_PRB_NEE=0 ablates next-event estimation
                # (shadow-ray transmittance) to attribute its cost share
                use_nee=os.environ.get("BENCH_PRB_NEE", "1") != "0",
                # BENCH_PRB_WALK=pallas: fused window-walk kernel
                # (pallas_kernels/ffwalk.py; one Mosaic variant) — flip the
                # default only after the queued profile_prb A/B wins
                walk_backend=os.environ.get("BENCH_PRB_WALK", "xla"),
                # BENCH_PRB_CGEMM=1: MXU coefficient GEMMs in the
                # streaming scans (XLA-only; profile_prb coeff=gemm row)
                coeff_gemm=os.environ.get("BENCH_PRB_CGEMM", "0") == "1",
            )
            pj = jax.jit(
                lambda p, s: vmodels.render(
                    p, pcam, prb_mod.radiance, pcfg, sky, spp=1, seed=s
                )
            )
            img_p = pj(smoke, jnp.int32(0))
            assert np.isfinite(np.asarray(img_p)).all()
            print(
                f"prb smoke mean radiance {float(np.mean(np.asarray(img_p))):.5f}"
                " (tail-cap bias check)",
                file=sys.stderr,
            )
            # timing fetches a SCALAR (summing the image outside jit pulls the
            # full 256^2x3 frame through the tunnel every rep — ~150 ms of
            # transfer that is not device time)
            pjs = jax.jit(
                lambda p, s: jnp.sum(
                    vmodels.render(
                        p, pcam, prb_mod.radiance, pcfg, sky, spp=1, seed=s
                    )
                )
            )
            float(pjs(smoke, jnp.int32(0)))
            pts = []
            for i in range(3):
                t0 = time.perf_counter()
                float(pjs(smoke, jnp.int32(i + 1)))
                pts.append(time.perf_counter() - t0)
            prb_s = float(np.min(pts))
            prb_mrays = pres * pres / prb_s / 1e6
            prb512_ms = None
            if os.environ.get("BENCH_PRB512", "1") != "0":
                pcam5 = dataclasses.replace(
                    pcam, width=2 * pres, height=2 * pres
                )
                pjs5 = jax.jit(
                    lambda p, s: jnp.sum(
                        vmodels.render(
                            p, pcam5, prb_mod.radiance, pcfg, sky, spp=1, seed=s
                        )
                    )
                )
                float(pjs5(smoke, jnp.int32(0)))
                p5 = []
                for i in range(3):
                    t0 = time.perf_counter()
                    float(pjs5(smoke, jnp.int32(i + 1)))
                    p5.append(time.perf_counter() - t0)
                prb512_ms = round(float(np.min(p5)) * 1e3, 1)
                print(
                    f"prb smoke 512^2x1spp: {prb512_ms:.0f} ms", file=sys.stderr
                )
            # The reference smoke acceptance config runs at spp=64
            # (render_volume.py:28,71) — demonstrate the FULL workload,
            # not just spp=1, with a mean-radiance bias check (the spp-64
            # mean must match the spp-1 mean within Monte Carlo noise:
            # both use the exact-escape estimator, so they share the same
            # expectation).
            prb64_ms = mean64 = None
            # BENCH_PRB64_SPP: smoke knob — the spp64 metric keys are only
            # written at the reference's true spp=64
            spp64 = int(os.environ.get("BENCH_PRB64_SPP", "64"))
            # BENCH_PRB_SPP_GROUP: samples folded per wavefront (round-5
            # spp amortization experiment). MEASURED NEGATIVE on hardware
            # (2026-08-20): g=4 gave 9953 ms vs 9559 ms ungrouped at
            # 256^2 x 64spp — prb cost is ray-linear; the 512^2-frame
            # sublinearity that motivated it comes from ray coherence
            # (finer pixels -> more chunk-skipping), which grouped
            # jitters of a coarser film do not reproduce. Default 1.
            g64 = int(os.environ.get("BENCH_PRB_SPP_GROUP", "1"))
            if os.environ.get("BENCH_PRB64", "1") != "0":
                pj64 = jax.jit(
                    lambda p, s: vmodels.render(
                        p, pcam, prb_mod.radiance, pcfg, sky, spp=spp64,
                        seed=s, spp_group=g64,
                    )
                )
                img64 = np.asarray(pj64(smoke, jnp.int32(0)))
                assert np.isfinite(img64).all()
                mean64 = float(np.mean(img64))
                pjs64 = jax.jit(
                    lambda p, s: jnp.sum(
                        vmodels.render(
                            p, pcam, prb_mod.radiance, pcfg, sky,
                            spp=spp64, seed=s, spp_group=g64,
                        )
                    )
                )
                float(pjs64(smoke, jnp.int32(0)))
                p64 = []
                for i in range(2):
                    t0 = time.perf_counter()
                    float(pjs64(smoke, jnp.int32(i + 7)))
                    p64.append(time.perf_counter() - t0)
                prb64_ms = round(float(np.min(p64)) * 1e3, 1)
                print(
                    f"prb smoke 256^2 x 64spp (the reference default "
                    f"workload): {prb64_ms:.0f} ms, mean radiance "
                    f"{mean64:.5f} (spp-1 mean "
                    f"{float(np.mean(np.asarray(img_p))):.5f})",
                    file=sys.stderr,
                )
            # The reference's ACTUAL default smoke workload is 512^2 x
            # spp64 (render_volume.py:45-46,71) — record it too (r4
            # verdict #6); one timed rep, it is the longest prb row.
            prb512_64_ms = None
            if (
                os.environ.get("BENCH_PRB512_SPP64", "1") != "0"
                and prb512_ms is not None
                and prb64_ms is not None and spp64 == 64
            ):
                # cap the grouped wavefront at ~512k rays (2x the proven
                # 512^2 size) — the 512^2 film already carries 262k rays
                g512 = max(1, min(g64, 524288 // (4 * pres * pres)))
                pjs5_64 = jax.jit(
                    lambda p, s: jnp.sum(
                        vmodels.render(
                            p, pcam5, prb_mod.radiance, pcfg, sky,
                            spp=spp64, seed=s, spp_group=g512,
                        )
                    )
                )
                float(pjs5_64(smoke, jnp.int32(0)))
                t0 = time.perf_counter()
                float(pjs5_64(smoke, jnp.int32(11)))
                prb512_64_ms = round((time.perf_counter() - t0) * 1e3, 1)
                print(
                    f"prb smoke 512^2 x 64spp (the reference TRUE "
                    f"default): {prb512_64_ms:.0f} ms",
                    file=sys.stderr,
                )
            prb_stats = {
                "prb_smoke_256_ms": round(prb_s * 1e3, 1),
                "prb_smoke_mrays": round(prb_mrays, 3),
                # 1spp mean radiance: the bias guard an estimator change
                # (e.g. BENCH_PRB_WALK=pallas) must hold fixed
                "prb_smoke_mean": round(
                    float(np.mean(np.asarray(img_p))), 5
                ),
                **({"prb_smoke_512_ms": prb512_ms} if prb512_ms else {}),
                **(
                    {
                        "prb_smoke_256_spp64_ms": prb64_ms,
                        "prb_smoke_256_spp64_mean": round(mean64, 5),
                    }
                    if prb64_ms is not None and spp64 == 64 and pres == 256
                    else {}
                ),
                **(
                    {"prb_smoke_512_spp64_ms": prb512_64_ms}
                    if prb512_64_ms is not None and pres == 256
                    else {}
                ),
                "prb_smoke_spp_group": g64,
            }
            print(
                f"prb smoke 256^2x1spp: {prb_s * 1e3:.0f} ms "
                f"({prb_mrays:.2f} Mrays/s primary)",
                file=sys.stderr,
            )
        except Exception as e:  # keep the headline metric alive
            print(f"prb smoke metric failed: {e}", file=sys.stderr)
    _emit_partial(prb_stats)

    # ---- truck-scale metric (BASELINE config #2 class: >=2M primitives) --
    scale_stats = {}
    if os.environ.get("BENCH_2M", "1") != "0":
        try:
            scale_stats = bench_2m(jax, jnp, vp, rf_tiled, cfg)
        except Exception as e:  # keep the headline metric alive
            print(f"2M-scale metric failed: {e}", file=sys.stderr)
        _emit_partial(scale_stats)
    if os.environ.get("BENCH_PRB1M", "1") != "0":
        try:
            scale_stats.update(bench_prb_cluster_1m(jax, jnp, vp))
        except Exception as e:
            print(f"prb-1M metric failed: {e}", file=sys.stderr)
        _emit_partial(scale_stats)

    baseline_proxy = 100.0  # Mrays/sec, see module docstring
    # fold in the truck-scale training parity block when the (long)
    # tools/refine_truck.py pipeline has produced one
    refine_stats = {}
    rt_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "REFINE_TRUCK.json"
    )
    if os.path.exists(rt_path):
        try:
            with open(rt_path) as f:
                refine_stats = {"refine_truck": json.load(f)}
        except Exception:
            pass
    details = {
        "rf_mrays": round(mrays, 3),
        "rf_psnr_vs_2x_shortlist_db": round(psnr2x, 2),
        "stages": stage,
        **band_stats,
        **train_stats,
        **prb_stats,
        **scale_stats,
        **refine_stats,
    }
    if np.isfinite(psnr_exact):  # surface scene only (fog has no golden)
        details["rf_psnr_vs_exact_db"] = round(psnr_exact, 2)
    # A/B sweeps (BENCH_NO_DETAILS=1) must not clobber the canonical
    # details of the default configuration
    if os.environ.get("BENCH_NO_DETAILS", "0") != "1":
        with open(_details_path(), "w") as f:
            json.dump(details, f, indent=1)
    print(
        json.dumps(
            {
                "metric": f"volprim_rf_tiled_3dgs_262k_{kind}",
                "value": round(mrays, 3),
                "unit": "Mrays/sec/chip",
                "vs_baseline": round(mrays / baseline_proxy, 4),
            }
        )
    )


if __name__ == "__main__":
    _probe_backend()
    main()
