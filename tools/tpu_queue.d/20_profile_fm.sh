# feat_major A/B stage attribution (XLA-only, no Mosaic compiles) —
# decides BENCH_FM/BENCH_CSORT defaults (VERDICT r3 #2).
cd /root/repo
timeout 7200 python tools/profile_rf.py --stages in_pack,in_gather,in_cull
timeout 7200 python tools/profile_rf.py --stages in_pack,in_gather,in_cull --feat_major
