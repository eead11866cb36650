# prb cost decomposition: collect vs window walk vs NEE share — and the
# round-4 fused Pallas walk A/B (walk=pallas row; one fresh Mosaic
# variant, 15-40 min compile) (VERDICT r3 #4b). Output recorded in
# tools/results/ and committed.
cd /root/repo
# Mosaic has no erf lowering (the original 25_profile_prb died on it);
# ffwalk now auto-selects the A&S poly on TPU, but export explicitly too.
export VOLPRIM_FFWALK_ERF=poly
mkdir -p tools/results
timeout 10800 python tools/profile_prb.py --reps 3 \
  2>&1 | tee tools/results/profile_prb_tpu.txt
rc=${PIPESTATUS[0]}
git add tools/results/profile_prb_tpu.txt
git commit -m "profile: prb on-TPU decomposition + fused-walk A/B" || true
exit $rc
