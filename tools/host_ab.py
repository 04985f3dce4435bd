#!/usr/bin/env python3
"""Same-day host-speed A/B: ratio a fresh bench detail's per-query
cpu_sec against a committed round artifact for the same build, print
the median factor (the value to export as SPARK_GRAFT_HOST_AB_FACTOR
for the big-scale sweep that follows).

The protocol (BASELINE.md r18 section): bench VMs differ in per-core
speed day to day; cpu_sec is pure compute, so the per-query ratio on
the SAME build + SAME sf0.1 corpus isolates host speed from plan
changes. Run the sf0.1 bench first, then:

    python3 tools/host_ab.py <fresh_detail.json> <committed_detail.json>

Queries with cpu < 0.5 s in the committed run are skipped (timer noise
dominates); chain/split queries are included like any other — the
median absorbs their wall-vs-cpu quirks.
"""
import json
import statistics
import sys


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    fresh = json.load(open(sys.argv[1]))
    base = json.load(open(sys.argv[2]))
    fc, bc = fresh.get("cpu_sec", {}), base.get("cpu_sec", {})
    ratios = {}
    for q, b in bc.items():
        f = fc.get(q)
        if f is None or b is None or b < 0.5 or f <= 0:
            continue
        ratios[q] = f / b
    if not ratios:
        sys.exit("no comparable queries (need shared names with cpu >= 0.5s)")
    med = statistics.median(ratios.values())
    for q in sorted(ratios, key=ratios.get):
        print(f"  {q}: {ratios[q]:.3f}", file=sys.stderr)
    print(f"[host_ab] {len(ratios)} queries, median cpu_sec ratio "
          f"(fresh/committed): {med:.4f}", file=sys.stderr)
    print(f"{med:.4f}")


if __name__ == "__main__":
    main()
