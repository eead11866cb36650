# Truck-scale training parity number (VERDICT r3 #6) -> REFINE_TRUCK.json.
cd /root/repo
timeout 21600 python tools/refine_truck.py
rc=$?
git add REFINE_TRUCK.json 2>/dev/null
git commit -m "refine_truck: on-TPU truck-scale training parity number" || true
exit $rc
