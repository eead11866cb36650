# prb cost decomposition: collect vs window walk vs NEE share — and the
# round-4 fused Pallas walk A/B (walk=pallas row; one fresh Mosaic
# variant, 15-40 min compile) (VERDICT r3 #4b).
timeout 10800 python tools/profile_prb.py --reps 3
