#!/usr/bin/env python3
"""Compare a graft.Bench JSON line against BASELINE.md's pin tables.

Dev tool. Usage: python3 tools/pins.py <bench.json> [bench2.json ...]

Parses every `| query | pinned_s |` table in BASELINE.md (later tables
override earlier ones — they are downward re-pins / new-query pins),
then for each bench file reports: total vs sum-of-pins, the v-family
contention sentinel (median ratio of code-unchanged pure-compute
v-queries), every query >2x pin, and every query BELOW pin (min-rule
downward re-pin candidates). With multiple files, per-query minima
across files are used for the re-pin list.
"""
import json, re, sys, statistics

def load_pins(path="BASELINE.md"):
    pins = {}
    rows = re.findall(r"^\|\s*([a-z]+[0-9]{2}_\w+)\s*\|\s*([0-9.]+)",
                      open(path).read(), re.M)
    for q, s in rows:
        pins[q] = float(s)  # later tables override: downward re-pins
    return pins

def registered(path="src/test/resources/plan_golden.txt"):
    """Every registered query, from the golden plan pins (PlanSpec
    regenerates that file from the registry, so it cannot trail)."""
    try:
        return [l.split(" ", 1)[0] for l in open(path) if l.strip()]
    except OSError:
        return []

def main():
    pins = load_pins()
    # self-check: every REGISTERED query must carry a pin, even before
    # any bench file covers it (the r10 verdict's ledger-hygiene rule)
    unpinned = [q for q in registered() if q not in pins]
    if unpinned:
        print("== SELF-CHECK: registered queries with NO pin in BASELINE.md:")
        for q in unpinned:
            print(f"  {q}")
    benches = []
    for f in sys.argv[1:]:
        benches.append(json.load(open(f))["queries"])
    for f, qs in zip(sys.argv[1:], benches):
        common = {q: t for q, t in qs.items() if q in pins}
        tot, ptot = sum(common.values()), sum(pins[q] for q in common)
        vfam = [qs[q] / pins[q] for q in common if q.startswith("v")]
        # a file may share no queries with the pins (subset run of
        # unpinned queries): skip the ratios rather than divide by zero
        ratio = f"{tot/ptot:.2f}x" if ptot else "n/a (no pinned queries)"
        sentinel = (f"{statistics.median(vfam):.2f}x" if vfam
                    else "n/a (no pinned v-queries)")
        print(f"== {f}: {len(qs)} queries, total {sum(qs.values()):.1f} s; "
              f"pinned subset {tot:.1f} vs sum-of-pins {ptot:.1f} = {ratio}; "
              f"v-family sentinel median {sentinel}")
        over = sorted(((qs[q] / pins[q], q) for q in common
                       if qs[q] > 2 * pins[q]), reverse=True)
        for r, q in over:
            print(f"  >2x: {q} {qs[q]:.2f} vs pin {pins[q]:.2f} = {r:.1f}x")
        new = sorted(q for q in qs if q not in pins)
        if new:
            print("  unpinned:", ", ".join(f"{q} {qs[q]:.2f}" for q in new))
    # min across files per query -> downward re-pin candidates
    mins = {}
    for qs in benches:
        for q, t in qs.items():
            mins[q] = min(mins.get(q, 1e9), t)
    below = sorted((q, t, pins[q]) for q, t in mins.items()
                   if q in pins and t < pins[q] - 0.005)
    if below:
        print("== min-rule downward re-pin candidates (min across files):")
        for q, t, p in below:
            print(f"  {q}: {p:.2f} -> {t:.2f}")

if __name__ == "__main__":
    main()
