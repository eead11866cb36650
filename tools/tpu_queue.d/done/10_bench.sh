# Driver-verification bench at committed defaults: warms all Mosaic
# variants, regenerates the on-TPU 2M golden (VERDICT r3 #1).
# Commits artifacts even on partial failure (bench merges partial
# sections into BENCH_DETAILS.json) so measured numbers survive a
# mid-run tunnel drop.
cd /root/repo
timeout 28800 python bench.py
rc=$?
git add BENCH_DETAILS.json tests/golden/*.npz 2>/dev/null
git commit -m "bench: on-TPU run at committed defaults (queued driver-verification)" || true
exit $rc
