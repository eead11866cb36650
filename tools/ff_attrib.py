"""Free-flight stage attribution via prb._FF_STOP (run on TPU or --cpu).

The escape-aware jump path should make the all-escape case nearly free
(collection + closed-form decision only), but round-3 profiling measured
~605 ms at 65k rays with xi ~ 0. This script times free_flight truncated
after each stage (collect -> ftotal -> escape -> sort -> full) with the
all-escape xi, so the deltas attribute the cost to a concrete stage.

Each stop changes trace-time structure: caches are cleared per variant.
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
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import volprim_tpu as vp
    from volprim_tpu.models import prb as prb_mod

    smoke = vp.scene.load_ply("/root/reference/resources/smoke.ply")
    smoke.attrs["sigma_t"] = smoke.attrs["sigma_t"] * 10.0
    pcam = vp.scene.CameraSpecs(
        name="prb", width=256, height=256,
        to_world=vp.scene.look_at([-4.0, -0.3, 0.0], [0, 0, 0], [0, 1, 0]),
        fov=40.0,
    )
    o, d = vp.scene.generate_rays(pcam, jitter=False)
    r = o.shape[0]
    cfg = prb_mod.PRBConfig(
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

    def make_ff(xi_val):
        def ff(s):
            oo = o + s.astype(jnp.float32) * 1e-12
            xi = jnp.full((r,), xi_val)
            out = prb_mod.free_flight(
                smoke, oo, d, xi, cfg, jnp.ones((r,), bool)
            )
            tot = jnp.float32(0.0)
            for x in out:
                xf = x.astype(jnp.float32)
                tot = tot + jnp.sum(jnp.where(jnp.isfinite(xf), xf, 0.0))
            return tot
        return ff

    results = {}
    stops = ("collect", "escape", "sort", None, "full_xi_rand")
    for stop in stops:
        if stop == "full_xi_rand":
            prb_mod._FF_STOP = None
            jax.clear_caches()

            def ff_rand(s):
                oo = o + s.astype(jnp.float32) * 1e-12
                xi = jax.random.uniform(
                    jax.random.PRNGKey(0), (r,), minval=1e-7
                )
                out = prb_mod.free_flight(
                    smoke, oo, d, xi, cfg, jnp.ones((r,), bool)
                )
                tot = jnp.float32(0.0)
                for x in out:
                    xf = x.astype(jnp.float32)
                    tot = tot + jnp.sum(
                        jnp.where(jnp.isfinite(xf), xf, 0.0)
                    )
                return tot

            fn = jax.jit(ff_rand)
        else:
            prb_mod._FF_STOP = stop
            jax.clear_caches()
            fn = jax.jit(make_ff(1e-30))
        t0 = time.perf_counter()
        float(fn(jnp.int32(0)))
        comp = time.perf_counter() - t0
        name = stop or "full_allescape"
        results[name] = timeit(fn)
        print(
            f"{name:16s} {results[name]:8.1f} ms  (compile {comp:.0f} s)",
            flush=True,
        )
    prb_mod._FF_STOP = None
    print("summary:", {k: round(v, 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
