"""Print the bench's CPU matmul sentinel (idle baseline ~0.8-0.9 s).

Usage: python tools/sentinel.py [n_repeats]

Run before/after any timing session: a reading far above ~1.0 s means
the box is in a degraded hypervisor phase and walls measured now will
not reproduce (r16 observed 0.32 s <-> 11.8 s swings). Same workload as
bench._calibrate's cpu_matmul_s, so readings are comparable to the
committed artifacts.
"""
import sys
import time

import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
for _ in range(n):
    t0 = time.perf_counter()
    a = np.ones((2048, 2048))
    for _ in range(4):
        a = a @ a * 1e-9
    print(f"cpu_matmul_s {time.perf_counter() - t0:.3f}")
