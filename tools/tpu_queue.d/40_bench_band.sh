# Re-run the order-band quality points after the feat_major Mosaic tiling
# fix (rf_tiled forces kernel_batch to a multiple of 8 under feat_major:
# the [F, kb, S] block puts kb in the second-to-last dim, which real TPU
# lowering requires 8-divisible — CPU interpret never checks, so the full
# bench's band section failed lowering on hardware, tpu_watch.log
# 2026-08-20T09:09). Runs only the headline+band sections (headline
# variants are warm; the two band points compile fresh), redirects details
# to /tmp, merges rf_band_* into the canonical BENCH_DETAILS.json.
cd /root/repo
export BENCH_TRAIN=0 BENCH_PRB=0 BENCH_PRB1M=0 BENCH_2M=0
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
    sys.exit(3)  # band section failed again — land in failed/, visibly
with open(dst) as f:
    d = json.load(f)
d.update(band)
with open(dst, "w") as f:
    json.dump(d, f, indent=1)
print("merged into BENCH_DETAILS.json:", sorted(band))
EOF
mrc=$?
git add BENCH_DETAILS.json
git commit -m "bench: on-TPU order-band quality points (post feat_major tiling fix)" || true
[ $rc -eq 0 ] && [ $mrc -eq 0 ]
