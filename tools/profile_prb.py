"""Cost decomposition of the prb smoke benchmark (run on TPU).

The round-2 diagnosis says prb cost scales with walked interval capacity;
round 3 needs the actual split between interval collection, window walks,
NEE transmittance and bounce overheads, plus how the knobs scale, to decide
where adaptive capacity and/or a Pallas kernel pay.

Every stage is timed by the axon protocol (scalar fetch, varied seed, min
of reps). Config variations reuse one scene; timings are DELTAs against
the ~26 ms dispatch floor.

Usage: python tools/profile_prb.py [--reps 3] [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--res", type=int, default=256,
                    help="film side; shrink for off-TPU validation runs")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import volprim_tpu as vp
    from volprim_tpu import models as vmodels
    from volprim_tpu.models import prb as prb_mod

    smoke = vp.scene.load_ply("/root/reference/resources/smoke.ply")
    smoke.attrs["sigma_t"] = smoke.attrs["sigma_t"] * 10.0
    sky = vp.ops.envmap.procedural_sky()
    pcam = vp.scene.CameraSpecs(
        name="prb", width=args.res, height=args.res,
        to_world=vp.scene.look_at([-4.0, -0.3, 0.0], [0, 0, 0], [0, 1, 0]),
        fov=40.0,
    )
    base = dict(
        max_depth=-1, bounce_cap=32, max_overlaps=8, max_windows=16,
        collect_budget=128, use_clusters=False,
    )

    def timeit(fn, reps=args.reps):
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(fn(jnp.int32(i + 1)))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts)) * 1e3

    results = {}

    def run_cfg(name, **kw):
        cfg = prb_mod.PRBConfig(**{**base, **kw})
        fn = jax.jit(
            lambda s: jnp.sum(
                vmodels.render(
                    smoke, pcam, prb_mod.radiance, cfg, sky, spp=1, seed=s
                )
            )
        )
        t0 = time.perf_counter()
        float(fn(jnp.int32(0)))
        comp = time.perf_counter() - t0
        ms = timeit(fn)
        results[name] = ms
        print(f"{name:28s} {ms:8.1f} ms  (compile {comp:.0f} s)", flush=True)

    run_cfg("full (bench cfg)")
    if not args.quick:
        # fused Pallas window walk (round 4, pallas_kernels/ffwalk.py):
        # ONE Mosaic variant for both rows below (k/window-count are
        # traced SMEM scalars); expect a 15-40 min first compile
        run_cfg("walk=pallas", walk_backend="pallas")
        # exact no-truncation sampling: the whole collected set as one
        # window — infeasible for the XLA walk ([R, 2K-1, K] segments)
        run_cfg(
            "walk=pallas exact", walk_backend="pallas",
            max_overlaps=128, max_windows=1,
        )
        # MXU coefficient GEMMs in the streaming scans (XLA-only, no
        # Mosaic variants) — decides the coeff_gemm default
        run_cfg("coeff=gemm", coeff_gemm=True)
        run_cfg("no_nee", use_nee=False)
        run_cfg("windows=4", max_windows=4)
        run_cfg("overlaps=4", max_overlaps=4)
        run_cfg("budget=64", collect_budget=64)
        run_cfg("bounces=8", bounce_cap=8)
        run_cfg("bounces=16", bounce_cap=16)
        run_cfg("solver=disabled", solver_type="disabled")
        run_cfg("compact=2048", compact_chunk=2048)
        run_cfg("compact=4096", compact_chunk=4096)

    # ---- standalone stage shapes ----------------------------------------
    o, d = vp.scene.generate_rays(pcam, jitter=False)
    r = o.shape[0]
    cfg = prb_mod.PRBConfig(**base)

    def collect(s):
        oo = o + s.astype(jnp.float32) * 1e-12
        e, x, i_, tb, _ft = prb_mod._collect_intervals(smoke, None, oo, d, cfg)
        return jnp.sum(e, where=jnp.isfinite(e)) + jnp.sum(tb, where=jnp.isfinite(tb))

    fn = jax.jit(collect)
    float(fn(jnp.int32(0)))
    results["collect_65k"] = timeit(fn)
    print(f"{'collect_65k':28s} {results['collect_65k']:8.1f} ms", flush=True)

    def trans(s):
        oo = o + s.astype(jnp.float32) * 1e-12
        return jnp.sum(prb_mod.transmittance(smoke, oo, d, cfg))

    fn = jax.jit(trans)
    float(fn(jnp.int32(0)))
    results["transmittance_65k"] = timeit(fn)
    print(
        f"{'transmittance_65k':28s} {results['transmittance_65k']:8.1f} ms",
        flush=True,
    )

    def ff(s):
        oo = o + s.astype(jnp.float32) * 1e-12
        xi = jax.random.uniform(jax.random.PRNGKey(0), (r,), minval=1e-7)
        found, dead, ts_, alb, s1, s2 = prb_mod.free_flight(
            smoke, oo, d, xi, cfg, jnp.ones((r,), bool)
        )
        return (
            jnp.sum(jnp.where(found, ts_, 0.0))
            + jnp.sum(alb) + jnp.sum(s1) + jnp.sum(s2)
        )

    fn = jax.jit(ff)
    float(fn(jnp.int32(0)))
    results["free_flight_65k"] = timeit(fn)
    print(
        f"{'free_flight_65k':28s} {results['free_flight_65k']:8.1f} ms",
        flush=True,
    )

    # escape/walk attribution: xi ~ 0 makes chi huge (every ray escapes in
    # closed form, all walk chunks skip); xi ~ 1 makes chi ~ 0 (every ray
    # crosses, every chunk walks). The delta is the walk's true share.
    def ff_xi(s, xi_val):
        oo = o + s.astype(jnp.float32) * 1e-12
        xi = jnp.full((r,), xi_val)
        found, dead, ts_, alb, s1, s2 = prb_mod.free_flight(
            smoke, oo, d, xi, cfg, jnp.ones((r,), bool)
        )
        return (
            jnp.sum(jnp.where(found, ts_, 0.0))
            + jnp.sum(alb) + jnp.sum(s1) + jnp.sum(s2)
        )

    for name, xi_val in (("ff_allescape_65k", 1e-30),
                         ("ff_allcross_65k", 1.0 - 1e-7)):
        fn = jax.jit(lambda s, xv=xi_val: ff_xi(s, xv))
        float(fn(jnp.int32(0)))
        results[name] = timeit(fn)
        print(f"{name:28s} {results[name]:8.1f} ms", flush=True)

    # ---- window-need + active-ray statistics ----------------------------
    xi = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(0), (r,), minval=1e-7)
    )
    stats = window_stats(prb_mod, smoke, o, d, jnp.asarray(xi), cfg)
    print("window stats bounce 0:", stats, flush=True)

    print("summary:", {k: round(v, 1) for k, v in results.items()}, flush=True)


def window_stats(prb_mod, prims, o, d, xi, cfg):
    """Replicate free_flight's window loop, reporting rays still unresolved
    entering each window (the adaptive-capacity design signal)."""
    import jax
    import jax.numpy as jnp

    r = o.shape[0]
    kern = cfg.kernel
    k = cfg.max_overlaps
    sig_all = prims.attrs["sigma_t"][:, 0]
    sprod_all = prims.scales[:, 0] * prims.scales[:, 1] * prims.scales[:, 2]

    @jax.jit
    def collect():
        return prb_mod._collect_intervals(prims, None, o, d, cfg)

    entry_all, exit_all, ids_all, t_budget, _ft = collect()
    n_open = np.asarray(jnp.sum(jnp.isfinite(entry_all), axis=-1))

    @jax.jit
    def one_window(t_min, trans, resolved, found):
        active = ~resolved
        entry, exit_t, sel, valid_sel, t_limit, has_more = (
            prb_mod._window_from_collected(entry_all, exit_all, t_min, k)
        )
        ids = jnp.take_along_axis(ids_all, sel, axis=-1)
        from volprim_tpu.ops import quadric

        coeffs = quadric.pair_coeffs_gathered(
            o, d, prims.centers, prims.scales, prims.quats, ids
        )
        sigma_t = jnp.where(valid_sel, sig_all[ids], 0.0)
        s_prod = sprod_all[ids]
        t_limit = jnp.minimum(t_limit, t_budget)
        full = has_more | jnp.isfinite(t_budget)
        trans_new, found_w, ts_w, _ = prb_mod._free_flight_window(
            kern, entry, exit_t, coeffs, sigma_t, s_prod, t_limit,
            trans, xi, active, cfg.solver_max_iterations, cfg.solver_type,
        )
        new_found = active & found_w
        resolved = resolved | new_found | (active & ~found_w & ~full)
        t_min = jnp.where(active & ~resolved, t_limit, t_min)
        return t_min, trans_new, resolved, found | new_found

    t_min = jnp.zeros((r,))
    trans = jnp.ones((r,))
    resolved = jnp.zeros((r,), bool)
    found = jnp.zeros((r,), bool)
    active_per_window = []
    for _ in range(cfg.max_windows):
        active_per_window.append(int(np.asarray(jnp.sum(~resolved))))
        t_min, trans, resolved, found = one_window(
            t_min, trans, resolved, found
        )
    return {
        "intervals_open_p50": float(np.percentile(n_open, 50)),
        "intervals_open_p90": float(np.percentile(n_open, 90)),
        "intervals_open_max": float(n_open.max()),
        "active_entering_window": active_per_window,
        "found_frac": float(np.asarray(jnp.mean(found))),
    }


if __name__ == "__main__":
    main()
