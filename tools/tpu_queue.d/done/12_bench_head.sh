# Full bench at round-5 HEAD (r4 verdict #8: every prb number in
# BENCH_r04 predates the b2fddce prb rewrite — re-verify at HEAD). Also
# picks up the reworked prb_1M_* block (brute design point + budget-kill
# bias vs the need-sized golden) and the 512^2 x 64spp reference-default
# prb row. Headline Mosaic variants are warm from the 2026-08-20 morning
# run; the new prb graphs are XLA-only (remote compile minutes, not
# Mosaic 15-40 min).
cd /root/repo
timeout 14400 python bench.py
rc=$?
git add BENCH_DETAILS.json
git commit -m "bench: on-TPU run at round-5 HEAD (prb re-verified, 1M golden bias, 512^2 spp64)" || true
exit $rc
