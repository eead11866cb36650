"""Hardware A/B autotuner: decide bench flag flips on the live backend.

The TPU tunnel dies for hours-to-days at a time (CLAUDE.md), so flag
decisions that need hardware numbers cannot wait for a builder session:
this tool runs targeted single-section bench trials in subprocesses,
compares them against the canonical baselines in BENCH_DETAILS.json
(written by the queued full bench, tools/tpu_queue.d/10_bench.sh), and
persists accepted flips to BENCH_TUNING.json — which bench.py folds into
its environment at startup, so a later driver-run bench executes the best
measured configuration unattended. Trials warm the flipped configs'
Mosaic variants as a side effect (the flip is only safe because of that:
a cold flip would cost the driver bench hours of recompiles).

Decisions:
  1. rf headline feat_major + cluster_sort (BENCH_FM/BENCH_CSORT):
     accept when Mrays improves >=2% and PSNR-vs-exact regresses
     <0.15 dB; falls back to feat_major alone if cluster_sort costs
     quality. Predicted +3-5 Mrays (kills the pack relayout +
     per-tile transposes; round-3 profile attribution).
  2. prb fused window walk (BENCH_PRB_WALK=pallas,
     pallas_kernels/ffwalk.py): accept when the smoke frame improves
     >=3% with the 1spp mean radiance within 1% (estimator bias guard).

Each trial redirects its sections to /tmp via BENCH_DETAILS_PATH; the
canonical BENCH_DETAILS.json is never touched.

Usage: python tools/autotune.py [--skip fm|prb] [--dry]
"""

import argparse
import json
import os
import subprocess
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATES = {
    "BENCH_PRB": "0", "BENCH_PRB1M": "0", "BENCH_BAND_POINTS": "",
}


def run_trial(name, extra_env, timeout_s):
    out = f"/tmp/autotune_{name}.json"
    if os.path.exists(out):
        os.remove(out)
    env = {**os.environ, **GATES, **extra_env, "BENCH_DETAILS_PATH": out}
    t0 = time.time()
    print(f"[autotune] trial {name}: {extra_env} "
          f"(timeout {timeout_s} s)", flush=True)
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(_repo, "bench.py")],
            env=env, timeout=timeout_s, capture_output=True, text=True,
            cwd=_repo,
        )
    except subprocess.TimeoutExpired:
        print(f"[autotune] trial {name} TIMED OUT", flush=True)
        return None
    sys.stderr.write(r.stderr[-3000:])
    if r.returncode != 0:
        print(f"[autotune] trial {name} rc={r.returncode}", flush=True)
        return None
    try:
        with open(out) as f:
            d = json.load(f)
    except Exception as e:
        print(f"[autotune] trial {name}: no details ({e})", flush=True)
        return None
    d["_trial_wall_s"] = round(time.time() - t0, 1)
    print(f"[autotune] trial {name}: {d}", flush=True)
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", action="append", default=[],
                    choices=["fm", "prb"])
    ap.add_argument("--dry", action="store_true",
                    help="decide but do not write BENCH_TUNING.json")
    args = ap.parse_args()

    base_path = os.path.join(_repo, "BENCH_DETAILS.json")
    with open(base_path) as f:
        base = json.load(f)
    if base.get("_partial"):
        print("[autotune] baseline BENCH_DETAILS.json is _partial "
              "(the full bench died mid-run) — comparing anyway against "
              "whatever sections it has", flush=True)

    tuning, notes = {}, {}

    def persist():
        """Write accepted flips immediately after each decision — a
        job-level timeout during a later trial must not lose them."""
        if not tuning or args.dry:
            return
        path = os.path.join(_repo, "BENCH_TUNING.json")
        existing = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    existing = json.load(f)
            except Exception:
                existing = {}
        existing.update(tuning)
        existing["_decided_by"] = "tools/autotune.py"
        existing["_notes"] = {**existing.get("_notes", {}), **notes}
        with open(path, "w") as f:
            json.dump(existing, f, indent=1)
        print(f"[autotune] wrote {path}: {tuning}", flush=True)

    # ---- 1. rf headline: feat_major (+ cluster_sort) -----------------------
    # BENCH_FM feeds the headline, the train section (bench.py tcfg), AND
    # the 2M section (bench_2m replaces classes/md/cf on the headline cfg
    # but inherits feat_major/cluster_sort): keep TRAIN and 2M on so the
    # flip's Mosaic variants for all three are warmed (and sanity-checked)
    # by the trial itself — a cold flip would cost the driver bench hours.
    if "fm" not in args.skip and "rf_mrays" in base:
        b_mrays = base["rf_mrays"]
        b_psnr = base.get("rf_psnr_vs_exact_db")
        t = run_trial(
            "fm_csort",
            {"BENCH_FM": "1", "BENCH_CSORT": "1",
             "BENCH_TRAIN": "1", "BENCH_2M": "1"},
            8 * 3600,
        )

        def ok(d):
            if not d or "rf_mrays" not in d:
                return False
            if d["rf_mrays"] < b_mrays * 1.02:
                return False
            if b_psnr is not None and "rf_psnr_vs_exact_db" in d:
                return d["rf_psnr_vs_exact_db"] >= b_psnr - 0.15
            return True

        if ok(t):
            tuning.update({"BENCH_FM": "1", "BENCH_CSORT": "1"})
            notes["fm"] = (
                f"fm+csort {t['rf_mrays']} Mrays @ "
                f"{t.get('rf_psnr_vs_exact_db')} dB vs base {b_mrays} @ "
                f"{b_psnr}"
            )
        elif t and "rf_mrays" in t and t["rf_mrays"] >= b_mrays * 1.02:
            # speed won but quality paid: try feat_major alone (same
            # Mosaic variants — cluster_sort is XLA-side pack ordering)
            t2 = run_trial(
                "fm_only",
                {"BENCH_FM": "1", "BENCH_TRAIN": "1", "BENCH_2M": "1"},
                3 * 3600,
            )
            if ok(t2):
                tuning["BENCH_FM"] = "1"
                notes["fm"] = (
                    f"fm {t2['rf_mrays']} Mrays @ "
                    f"{t2.get('rf_psnr_vs_exact_db')} dB vs base "
                    f"{b_mrays} @ {b_psnr} (csort rejected: "
                    f"{t.get('rf_psnr_vs_exact_db')} dB)"
                )
            else:
                notes["fm"] = "rejected (quality cost with and without csort)"
        else:
            notes["fm"] = "rejected (no >=2% speed win)" if t else "trial failed"
        persist()

    # ---- 2. prb fused window walk ------------------------------------------
    if "prb" not in args.skip and "prb_smoke_256_ms" in base:
        b_ms = base["prb_smoke_256_ms"]
        b_mean = base.get("prb_smoke_mean")
        prb_env = {"BENCH_PRB": "1", "BENCH_PRB_WALK": "pallas",
                   "BENCH_PRB512": "0", "BENCH_PRB64": "0",
                   "BENCH_TRAIN": "0", "BENCH_2M": "0"}
        t = run_trial("prb_walk", prb_env, 3 * 3600)
        erf_fallback = False
        if not (t and "prb_smoke_256_ms" in t):
            # Mosaic erf support is unverified (pallas_kernels/ffwalk.py):
            # if the native-erf kernel failed to compile, the A&S 7.1.26
            # polynomial (1.5e-7 abs err) is the designed fallback.
            erf_fallback = True
            t = run_trial(
                "prb_walk_polyerf",
                {**prb_env, "VOLPRIM_FFWALK_ERF": "poly"},
                3 * 3600,
            )
        if t and "prb_smoke_256_ms" in t:
            speed_ok = t["prb_smoke_256_ms"] <= b_ms * 0.97
            bias_ok = (
                b_mean is None or "prb_smoke_mean" not in t
                or abs(t["prb_smoke_mean"] - b_mean)
                <= 0.01 * max(abs(b_mean), 1e-6)
            )
            if speed_ok and bias_ok:
                tuning["BENCH_PRB_WALK"] = "pallas"
                if erf_fallback:
                    tuning["VOLPRIM_FFWALK_ERF"] = "poly"
                notes["prb"] = (
                    f"pallas walk {t['prb_smoke_256_ms']} ms vs {b_ms} ms "
                    f"(mean {t.get('prb_smoke_mean')} vs {b_mean}"
                    f"{', poly-erf fallback' if erf_fallback else ''})"
                )
            else:
                notes["prb"] = (
                    f"rejected (speed_ok={speed_ok} bias_ok={bias_ok}: "
                    f"{t['prb_smoke_256_ms']} ms vs {b_ms} ms)"
                )
        else:
            notes["prb"] = "trial failed"

    print(f"[autotune] decisions: tuning={tuning} notes={notes}", flush=True)
    persist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
