#!/usr/bin/env python3
"""Fixed-work host canary for soak spike attribution (round 10).

Runs the same pure-CPU integer workload every ~2 s beside a soak and
logs its duration tagged with the soak's in-flight visit. A canary
inflation INSIDE a slow-visit window and nowhere else pins the slowdown
on the host (co-tenant/hypervisor contention), independent of the JVM —
the probe that settled VERDICT r9 #5: 3-12x inflation exactly during
run 3's only slow window (visits 11-12), engine exonerated.

Usage: python3 scripts/host_canary.py [soak_log] > canary_trace.log
Pair with scripts/gc_analyze.py (GC/safepoint exoneration) and a
/proc sampler (iowait/Dirty/steal) for the full forensics kit.
"""
import time, sys
SOAK_LOG = sys.argv[1] if len(sys.argv) > 1 else '/tmp/soak1000x_r10_run3.log'
# fixed-work CPU canary: same integer workload each tick; duration
# inflation == host-side slowdown (contention), independent of the JVM
def work():
    s = 0
    for i in range(2_000_000):
        s += i * i ^ (i >> 3)
    return s
while True:
    t0 = time.perf_counter()
    work()
    dt = time.perf_counter() - t0
    try:
        vc = sum(1 for l in open(SOAK_LOG, errors='replace') if '"visit"' in l)
    except OSError:
        vc = -1
    print(f"{time.time():.0f} canary_s={dt:.3f} visits_done={vc}", flush=True)
    time.sleep(2)
