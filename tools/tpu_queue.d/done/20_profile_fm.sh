# feat_major A/B stage attribution (XLA-only, no Mosaic compiles) —
# decides BENCH_FM/BENCH_CSORT defaults (VERDICT r3 #2). Output is
# recorded in tools/results/ and committed.
cd /root/repo
mkdir -p tools/results
timeout 7200 python tools/profile_rf.py --stages in_pack,in_gather,in_cull \
  2>&1 | tee tools/results/profile_fm_base.txt
rc1=${PIPESTATUS[0]}
timeout 7200 python tools/profile_rf.py --stages in_pack,in_gather,in_cull \
  --feat_major 2>&1 | tee tools/results/profile_fm_fm.txt
rc2=${PIPESTATUS[0]}
git add tools/results/profile_fm_*.txt
git commit -m "profile: feat_major on-TPU stage attribution A/B" || true
[ "$rc1" -eq 0 ] && [ "$rc2" -eq 0 ]
