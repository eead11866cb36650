# Final round-5 bench at committed defaults + BENCH_TUNING flips (csort
# headline, band8 criterion point, ungrouped spp64, depth-sized 1M
# golden, 2M csort). All Mosaic variants warm from today's runs. This is
# insurance: if the tunnel dies before the driver's end-of-round bench,
# the canonical BENCH_DETAILS.json still carries the round-5 numbers.
cd /root/repo
timeout 14400 python bench.py
rc=$?
git add BENCH_DETAILS.json
git commit -m "bench: full on-TPU run at round-5 final defaults" || true
exit $rc
