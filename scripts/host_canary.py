#!/usr/bin/env python3
"""Fixed-work host canary for soak spike attribution (round 10).

Runs the same pure-CPU integer workload every ~2 s beside a soak and
logs its duration tagged with the soak's in-flight visit. A canary
inflation INSIDE a slow-visit window and nowhere else pins the slowdown
on the host (co-tenant/hypervisor contention), independent of the JVM —
the probe that settled VERDICT r9 #5: 3-12x inflation exactly during
run 3's only slow window (visits 11-12), engine exonerated.

Round 14 adds an I/O canary beside the CPU one (VERDICT r13 next #3):
a fixed-size fsync'd write+read probe each tick (io_s column). The CPU
canary is structurally blind to store-side I/O bursts — a soak window
whose store verbs inflate while detect_time stays flat used to rest on
timer decomposition alone; with both canaries, an I/O-side host burst
gets POSITIVE in-window evidence (io_s inflates, canary_s flat) and a
CPU-side one the converse.

Usage: python3 scripts/host_canary.py [soak_log] [probe_dir] > canary_trace.log
Pair with scripts/gc_analyze.py (GC/safepoint exoneration) and a
/proc sampler (iowait/Dirty/steal) for the full forensics kit.
"""
import os, time, sys
SOAK_LOG = sys.argv[1] if len(sys.argv) > 1 else '/tmp/soak1000x_r10_run3.log'
# the I/O probe writes where the soak writes (same filesystem/device),
# overridable for soaks on a different mount
PROBE_DIR = sys.argv[2] if len(sys.argv) > 2 else '/tmp'
PROBE_BYTES = 4 * 1024 * 1024  # fixed work: 4 MiB, fsync'd, read back
_BUF = os.urandom(PROBE_BYTES)  # constant payload — no per-tick gen cost
# fixed-work CPU canary: same integer workload each tick; duration
# inflation == host-side slowdown (contention), independent of the JVM
def work():
    s = 0
    for i in range(2_000_000):
        s += i * i ^ (i >> 3)
    return s
# Parallel canary (round-14 continuation): a SINGLE-thread probe
# under-detects partial-core co-tenant load — on a 32-core host a
# burst eating 10 cores slows a 16-thread executor pool while the
# 1-thread canary rides a free core (observed: a 72 s store phase with
# the single canary flat). N processes of the same fixed work contend
# the way the engine does; par inflation with single flat = partial
# steal. Processes, not threads: the GIL serializes Python threads.
PAR_N = min(8, os.cpu_count() or 8)
def work_par():
    # explicit fork context: spawn/forkserver start methods re-import
    # this module, whose top level is an infinite loop — the first
    # work_par() would hang (forkserver preload never returns) or
    # fork-bomb. fork inherits the live interpreter and is the default
    # this probe was measured under.
    import multiprocessing
    with multiprocessing.get_context('fork').Pool(PAR_N) as p:
        p.map(_work_child, range(PAR_N))
def _work_child(_):
    return work()
def io_work():
    # A transient probe error (ENOSPC during the soak's heavy write
    # phase, EIO) must NOT kill the trace — that is exactly the degraded
    # window the canary exists to witness. Report io_s=-1 for the tick
    # and keep going; the probe file is removed on every path.
    p = os.path.join(PROBE_DIR, f'.canary_io_{os.getpid()}')
    try:
        fd = os.open(p, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
        try:
            os.write(fd, _BUF)
            os.fsync(fd)  # the probe is the DURABLE write path, not the page cache
        finally:
            os.close(fd)
        with open(p, 'rb') as f:
            n = len(f.read())
        # a short read is a failed tick, not a fatal assert — an
        # AssertionError would escape the OSError handler and kill the
        # trace the surrounding comment promises to keep alive
        return n == PROBE_BYTES
    except OSError:
        return False
    finally:
        try:
            os.unlink(p)
        except OSError:
            pass
tick = 0
while True:
    t0 = time.perf_counter()
    work()
    dt = time.perf_counter() - t0
    t1 = time.perf_counter()
    io_ok = io_work()
    dio = time.perf_counter() - t1 if io_ok else -1.0
    # the parallel probe burns PAR_N cores for ~a work() duration — a
    # heavier observer, so sample it every 5th tick (~2% host duty)
    dpar = -1.0
    if tick % 5 == 0:
        t2 = time.perf_counter()
        work_par()
        dpar = time.perf_counter() - t2
    tick += 1
    try:
        vc = sum(1 for l in open(SOAK_LOG, errors='replace') if '"visit"' in l)
    except OSError:
        vc = -1
    print(f"{time.time():.0f} canary_s={dt:.3f} par{PAR_N}_s={dpar:.3f} "
          f"io_s={dio:.3f} visits_done={vc}", flush=True)
    time.sleep(2)
