# Truck-scale training parity, re-queued after two infra failures (a
# tunnel-worker death mid-GT, then a stale 64^2 --tiny view satisfying
# the resume cache — both fixed: block-streamed exact renders, GT resume
# with resolution validation). 9/10 GT views are cached valid on disk.
cd /root/repo
timeout 21600 python tools/refine_truck.py
rc=$?
git add REFINE_TRUCK.json 2>/dev/null
git commit -m "refine_truck: on-TPU truck-scale training parity number" || true
exit $rc
