# 2M quality ladder A/B (r4 verdict #4: >=25.5 dB at >=7 Mrays; shipped
# row 24.35 dB @ 6.99 with ~11% need truncation). Two candidates, each
# ONE fresh Mosaic variant:
#   band:   band_classes 0,0,0,16 — band only the deepest-need class
#   deep:   last class budget 1024 -> 2048 (zero truncation in the top
#           class; kernel_compact keeps the walk on surviving columns)
# Accepted flips persist via BENCH_TUNING.json (BENCH_2M_BAND /
# BENCH_2M_CLASSES), which bench.py folds into its env.
cd /root/repo
run_trial() {
  name=$1; shift
  env BENCH_TRAIN=0 BENCH_PRB=0 BENCH_PRB1M=0 BENCH_BAND_POINTS="" \
      BENCH_DETAILS_PATH=/tmp/q2m_$name.json "$@" \
      timeout 10800 python bench.py
  echo "[2mq] trial $name rc=$?"
}
run_trial band BENCH_2M_BAND=0,0,0,16
run_trial deep BENCH_2M_CLASSES=0.3:128,0.2:384,0.25:512,0.25:2048
python - <<'EOF'
import json, os, sys
with open("BENCH_DETAILS.json") as f:
    base = json.load(f)
bq, bm = base.get("rf_2M_psnr_vs_exact_db"), base.get("rf_2M_mrays")
cands = {}
for name, flip in (
    ("band", {"BENCH_2M_BAND": "0,0,0,16"}),
    ("deep", {"BENCH_2M_CLASSES": "0.3:128,0.2:384,0.25:512,0.25:2048"}),
):
    p = f"/tmp/q2m_{name}.json"
    if not os.path.exists(p):
        continue
    with open(p) as f:
        t = json.load(f)
    q, m = t.get("rf_2M_psnr_vs_exact_db"), t.get("rf_2M_mrays")
    if q is None or m is None:
        continue
    cands[name] = (q, m, flip)
    print(f"[2mq] {name}: {q} dB at {m} Mrays (base {bq} dB at {bm})")
tuning = {}
if os.path.exists("BENCH_TUNING.json"):
    with open("BENCH_TUNING.json") as f:
        tuning = json.load(f)
notes = tuning.setdefault("_notes", {})
best = None
for name, (q, m, flip) in cands.items():
    # criterion first; else a clear quality win at tolerable throughput
    meets = q >= 25.5 and m >= 7.0
    decent = bq is None or (q >= bq + 0.25 and m >= 6.5)
    score = (meets, q)
    if (meets or decent) and (best is None or score > best[0]):
        best = (score, name, q, m, flip)
if best:
    _, name, q, m, flip = best
    tuning.update(flip)
    notes["2m"] = f"accepted {name}: {q} dB at {m} Mrays (base {bq}/{bm})"
else:
    notes["2m"] = (
        f"no candidate beat base {bq} dB @ {bm} Mrays: "
        + "; ".join(f"{n}={v[0]}dB@{v[1]}" for n, v in cands.items())
        if cands else "trials failed"
    )
with open("BENCH_TUNING.json", "w") as f:
    json.dump(tuning, f, indent=1)
print("[2mq] decision:", notes["2m"])
sys.exit(0 if cands else 3)
EOF
rc=$?
git add BENCH_TUNING.json
git commit -m "bench: 2M quality ladder A/B (per-class band / deeper top class)" || true
exit $rc
