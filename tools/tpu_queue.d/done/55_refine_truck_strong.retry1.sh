# Truck parity, strong-perturbation experiment (round-5 finding: the mild
# scramble left the held-out gap smaller than the 1M tiled-vs-exact
# approximation bound, so cross-renderer eval showed init 25.24 ->
# refined 23.12 — the optimizer traded exact-fidelity for tiled-fit).
# Strong scramble makes recovery dominate the bound; both eval protocols
# (exact cross-renderer + the reference's same-renderer tiled) are
# recorded. Fresh workdir (resume guards); GT views are scene_true
# renders and carry over from the mild run's cache.
cd /root/repo
mkdir -p /tmp/refine_truck2/images
cp /tmp/refine_truck/images/*.npy /tmp/refine_truck2/images/ 2>/dev/null || true
python - <<'PY'
# drop any stale tiny-res views defensively (the tool also validates)
import glob, os
import numpy as np
for f in glob.glob("/tmp/refine_truck2/images/*.npy"):
    if np.load(f).shape != (256, 256, 3):
        os.remove(f)
PY
timeout 21600 python tools/refine_truck.py --perturb strong \
  --workdir /tmp/refine_truck2
rc=$?
git add REFINE_TRUCK.json 2>/dev/null
git commit -m "refine_truck: strong-perturbation parity numbers (dual eval protocol)" || true
exit $rc
