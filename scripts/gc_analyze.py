#!/usr/bin/env python3
"""Correlate soak GC pauses with visit wall times.

Usage: gc_analyze.py <gc_log> <soak_log> [pause_ms_threshold]
Parses -Xlog:gc*,safepoint unified logging: pause lines like
  [12.345s][info][gc] GC(42) Pause Young (Normal) ... 123.456ms
and safepoint stalls, then maps each visit's [uptime] window (from the
soak log line order we can't get directly -- instead bucket pauses by
uptime and report the biggest per 60s window plus totals).
"""
import re, sys, json

gc_log, soak_log = sys.argv[1], sys.argv[2]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1000.0

pauses = []  # (uptime_s, ms, desc)
pat = re.compile(r"\[(\d+\.\d+)s\].*?(Pause [^,]*?)[ ,].*?(\d+\.\d+)ms\s*$")
for line in open(gc_log, errors="replace"):
    m = pat.search(line)
    if m:
        pauses.append((float(m.group(1)), float(m.group(3)), m.group(2).strip()))

total_ms = sum(p[1] for p in pauses)
big = [p for p in pauses if p[1] >= thr]
print(f"gc pauses={len(pauses)} total={total_ms/1000:.1f}s "
      f">= {thr:.0f}ms: {len(big)}")
for t, ms, d in sorted(big, key=lambda p: -p[1])[:20]:
    print(f"  uptime={t:9.1f}s pause={ms/1000:6.2f}s {d}")

# visit wall times with cumulative uptime estimate: visits are
# sequential after catalog persist; reconstruct visit windows from the
# soak log's per-visit seconds plus the persist/startup offset.
vis = [json.loads(m) for m in
       re.findall(r'\{"visit":.*?\}', open(soak_log, errors="replace").read())]
cat = re.search(r'\{"catalog":[^}]*"sec":([0-9.]+)', open(soak_log, errors="replace").read())
comps = [json.loads(m) for m in re.findall(r'\{"compact":.*?\}', open(soak_log, errors="replace").read())]
comp_by_visit = {c["visit"]: c["sec"] for c in comps}
if vis:
    # uptime at visit start: startup (first pause's context suggests ~60s
    # for pretouch+catalog) -- use catalog sec + 75s heuristic then refine
    off = (float(cat.group(1)) if cat else 0) + 80.0
    windows = []
    for v in vis:
        windows.append((v["visit"], off, off + v["sec"], v["sec"]))
        off += v["sec"]
        off += comp_by_visit.get(v["visit"], 0.0)
    slow = [w for w in windows if w[3] >= 40.0]
    print("\nslow visits (>=40s) vs in-window GC:")
    for vid, a, b, sec in slow:
        inwin = [p for p in pauses if a - 10 <= p[0] <= b + 10]
        ms = sum(p[1] for p in inwin)
        mx = max((p[1] for p in inwin), default=0)
        print(f"  visit {vid}: {sec:.1f}s, gc_in_window={ms/1000:.1f}s max_pause={mx/1000:.2f}s")
