# Trimmed autotune (round 5): the two original trials are already decided
# by hardware evidence recorded in BENCH_TUNING.json _notes (fm: stage
# attribution says the fm gather loses; prb pallas walk: today's A/B lost
# 247.5 vs 172.7 ms), so re-measuring them would burn hours of Mosaic
# compiles to confirm known losses. What remains undecided on hardware is
# the decoupled cluster_sort (pure data permute, zero new variants): run
# the headline section with BENCH_CSORT=1 and flip on a quality win
# within a small throughput budget.
cd /root/repo
export BENCH_TRAIN=0 BENCH_PRB=0 BENCH_PRB1M=0 BENCH_2M=0
export BENCH_BAND_POINTS=""
export BENCH_CSORT=1
export BENCH_DETAILS_PATH=/tmp/csort_trial.json
timeout 7200 python bench.py
rc=$?
python - <<'EOF'
import json, os, sys
if not os.path.exists("/tmp/csort_trial.json"):
    sys.exit(3)
with open("/tmp/csort_trial.json") as f:
    t = json.load(f)
with open("BENCH_DETAILS.json") as f:
    base = json.load(f)
tm, bm = t.get("rf_mrays"), base.get("rf_mrays")
tq = t.get("rf_psnr_vs_exact_db")
bq = base.get("rf_psnr_vs_exact_db")
if None in (tm, bm, tq, bq):
    sys.exit(3)
tuning = {}
if os.path.exists("BENCH_TUNING.json"):
    with open("BENCH_TUNING.json") as f:
        tuning = json.load(f)
notes = tuning.setdefault("_notes", {})
win = tq >= bq + 0.15 and tm >= 0.98 * bm
if win:
    tuning["BENCH_CSORT"] = "1"
    notes["csort"] = (
        f"accepted: {tq} dB at {tm} Mrays vs baseline {bq} dB at {bm}"
    )
else:
    notes["csort"] = (
        f"rejected (quality {tq} vs {bq} dB, mrays {tm} vs {bm})"
    )
with open("BENCH_TUNING.json", "w") as f:
    json.dump(tuning, f, indent=1)
print("csort decision:", notes["csort"])
EOF
mrc=$?
git add BENCH_TUNING.json
git commit -m "Record hardware-decided bench flag flips (csort A/B; fm and prb walk decided from recorded evidence)" || true
[ $rc -eq 0 ] && [ $mrc -eq 0 ]
