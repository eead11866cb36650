# Hardware A/B flag decisions (feat_major headline, prb fused walk):
# writes BENCH_TUNING.json so the driver's bench runs the best measured
# config with warm Mosaic variants even if no builder session is around.
cd /root/repo
timeout 36000 python tools/autotune.py
rc=$?
if [ -f BENCH_TUNING.json ] && ! git diff --quiet -- BENCH_TUNING.json \
   || [ -n "$(git status --porcelain BENCH_TUNING.json)" ]; then
  git add BENCH_TUNING.json
  git commit -m "Record hardware-decided bench flag flips (autotune A/B)" || true
fi
exit $rc
