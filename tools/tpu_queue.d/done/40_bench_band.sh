# Order-band quality points on TPU, round-5 config: non-fm layout (the fm
# gathers measured +8 ms/frame) with decoupled cluster_sort, and a band8
# vs band16 A/B at the mc4096 criterion point (CPU probe: band8 31.80 dB
# vs band16 31.96 at half the band ops — if band8 holds >=31.5 on
# hardware its cheaper walk is the better default). Each point is one
# fresh Mosaic variant. Merges rf_band_* into the canonical
# BENCH_DETAILS.json and records the winning default in BENCH_TUNING.
cd /root/repo
export BENCH_TRAIN=0 BENCH_PRB=0 BENCH_PRB1M=0 BENCH_2M=0
export BENCH_BAND_POINTS="8:4096,16:4096"
export BENCH_DETAILS_PATH=/tmp/bench_band.json
timeout 14400 python bench.py
rc=$?
python - <<'EOF'
import json, os, sys
src, dst = "/tmp/bench_band.json", "BENCH_DETAILS.json"
if not os.path.exists(src):
    sys.exit(3)
with open(src) as f:
    s = json.load(f)
band = {k: v for k, v in s.items() if k.startswith("rf_band_")}
if not band:
    sys.exit(3)
with open(dst) as f:
    d = json.load(f)
d.update(band)
with open(dst, "w") as f:
    json.dump(d, f, indent=1)
print("merged into BENCH_DETAILS.json:", sorted(band))
# pick the criterion-point default: prefer the cheaper band8 when it
# holds >= 31.5 dB, else band16
p8, m8 = s.get("rf_band_psnr_vs_exact_db"), s.get("rf_band_mrays")
p16 = s.get("rf_band_psnr_vs_exact_db_mc4096")
m16 = s.get("rf_band_mrays_mc4096")
tuning = {}
if os.path.exists("BENCH_TUNING.json"):
    with open("BENCH_TUNING.json") as f:
        tuning = json.load(f)
notes = tuning.setdefault("_notes", {})
pick = None
if p8 is not None and p8 >= 31.5:
    pick = ("8:4096", p8, m8)
elif p16 is not None and p16 >= 31.5:
    pick = ("16:4096", p16, m16)
if pick:
    # winner ONLY: any second point would be a cold Mosaic variant in
    # the driver bench (the mc8192 non-fm point was never compiled)
    tuning["BENCH_BAND_POINTS"] = pick[0]
    notes["band"] = (
        f"criterion point {pick[0]}: {pick[1]} dB at {pick[2]} Mrays "
        f"(band8 {p8}dB@{m8}, band16 {p16}dB@{m16})"
    )
else:
    notes["band"] = (
        f"no point held 31.5 dB (band8 {p8}dB@{m8}, band16 {p16}dB@{m16})"
    )
with open("BENCH_TUNING.json", "w") as f:
    json.dump(tuning, f, indent=1)
print("band decision:", notes["band"])
EOF
mrc=$?
git add BENCH_DETAILS.json BENCH_TUNING.json
git commit -m "bench: on-TPU order-band quality points (non-fm csort; band8 vs band16 A/B)" || true
[ $rc -eq 0 ] && [ $mrc -eq 0 ]
