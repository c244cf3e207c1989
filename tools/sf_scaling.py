#!/usr/bin/env python3
"""sf-scaling exponent audit (round-10 mandate 9).

Consumes two Bench JSON outputs (same query set, different scale
factors — canonically sf0.01 and sf0.1, a 10x data ratio) and reports
per-query and per-family time ratios. With a 10x data step, a ratio
around 10 is linear scaling, well below 10 means fixed overhead
dominates at the small SF (fine), and well ABOVE 10 is superlinear —
the query either gets an in-source cost-model note or a fix.

Families are the operator namespaces: q (relational), d (dedup),
s (similarity), t (text), m (multimodal), p (corpus pipeline),
stream (run-to-completion gates, priced by micro-batch machinery).

Usage: tools/sf_scaling.py bench_small.json bench_big.json [ratio_flag]
"""
import json
import sys


def family(name: str) -> str:
    if "stream" in name:
        return "stream"
    for p in ("q", "d", "s", "t", "m", "p"):
        if name.startswith(p) and name[len(p)].isdigit():
            return p
    return "other"


def main() -> None:
    small = json.load(open(sys.argv[1]))["queries"]
    big = json.load(open(sys.argv[2]))["queries"]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for name, t_small in sorted(small.items()):
        t_big = big.get(name)
        if t_big is None:
            continue
        rows.append((name, family(name), t_small, t_big, t_big / t_small))
    fams = {}
    for name, fam, ts, tb, r in rows:
        fams.setdefault(fam, []).append((name, ts, tb, r))
    print(f"{'family':8} {'n':>4} {'sum_small':>10} {'sum_big':>9} "
          f"{'sum_ratio':>9} {'median_r':>9} {'max_r':>7}  worst")
    for fam in sorted(fams):
        qs = fams[fam]
        ss = sum(t for _, t, _, _ in qs)
        sb = sum(t for _, _, t, _ in qs)
        rs = sorted(r for _, _, _, r in qs)
        med = rs[len(rs) // 2]
        worst = max(qs, key=lambda x: x[3])
        print(f"{fam:8} {len(qs):>4} {ss:>10.1f} {sb:>9.1f} "
              f"{sb / ss:>9.2f} {med:>9.2f} {worst[3]:>7.2f}  {worst[0]}")
    over = [(n, f, ts, tb, r) for n, f, ts, tb, r in rows if r > flag]
    print(f"\nqueries with ratio > {flag} (superlinear candidates at a "
          f"10x data step):")
    for n, f, ts, tb, r in sorted(over, key=lambda x: -x[4]):
        print(f"  {n:40} {ts:7.2f}s -> {tb:7.2f}s  x{r:.1f}")
    if not over:
        print("  (none)")


if __name__ == "__main__":
    main()
