# prb + 1M sections at round-5 HEAD: measures the spp_group=4 spp-64
# amortization (r4 verdict #6; projected ~9.6 s -> ~6 s) and the depth-
# sized 1M budget-kill golden (mo from the measured open-interval sweep).
# XLA-only graphs — remote compiles of minutes, no Mosaic variants.
cd /root/repo
export BENCH_TRAIN=0 BENCH_2M=0 BENCH_BAND_POINTS=""
export BENCH_DETAILS_PATH=/tmp/bench_prb_head.json
timeout 10800 python bench.py
rc=$?
python - <<'EOF'
import json, os, sys
src, dst = "/tmp/bench_prb_head.json", "BENCH_DETAILS.json"
if not os.path.exists(src):
    sys.exit(3)
with open(src) as f:
    s = json.load(f)
keep = {k: v for k, v in s.items() if k.startswith(("prb_", "rf_mrays"))}
if not any(k.startswith("prb_smoke") for k in keep):
    sys.exit(3)
with open(dst) as f:
    d = json.load(f)
d.update({k: v for k, v in keep.items() if k.startswith("prb_")})
with open(dst, "w") as f:
    json.dump(d, f, indent=1)
print("merged prb rows into BENCH_DETAILS.json:", sorted(keep))
EOF
mrc=$?
git add BENCH_DETAILS.json
git commit -m "bench: grouped-spp prb workload + depth-sized 1M golden on TPU" || true
[ $rc -eq 0 ] && [ $mrc -eq 0 ]
