# Driver-verification bench at committed defaults: warms all Mosaic
# variants, regenerates the on-TPU 2M golden (VERDICT r3 #1).
timeout 28800 python bench.py
