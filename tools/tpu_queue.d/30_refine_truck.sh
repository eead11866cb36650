# Truck-scale training parity number (VERDICT r3 #6) -> REFINE_TRUCK.json.
cd /root/repo && timeout 21600 python tools/refine_truck.py
