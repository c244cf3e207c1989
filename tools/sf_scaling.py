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

Round-12 mandate #5 extension — 3-point exponent fit:

  tools/sf_scaling.py fit probe_lines.jsonl

consumes graft.tools.ScalingProbe output (one JSON line per sf with
n_vecs, work-unit counts and per-probe seconds) and reports, per
probe, the fitted exponent of wall time against the MEASURED input
size and work volume rather than against sf. This matters for the
embeddings-backed d/s families: the table is 500 rows at BOTH sf0.001
and sf0.01 and 2000 at sf0.1, so an sf-ratio is meaningless there and
the 10x step's time ratio is flattered by fixed overhead. With two
replicate points at n=500 and one at n=2000, the least-squares slope
of log t vs log n reduces to log(t_big / mean(t_small)) / log(4); the
floor share column (mean small time / big time) states how much of
the big-SF measurement is still fixed overhead.
"""
import json
import math
import sys


def family(name: str) -> str:
    if "stream" in name:
        return "stream"
    for p in ("q", "d", "s", "t", "m", "p"):
        if name.startswith(p) and name[len(p)].isdigit():
            return p
    return "other"


def fit(path: str) -> None:
    lines = [json.loads(l) for l in open(path) if l.strip()]
    if len(lines) < 2:
        sys.exit("fit needs at least two probe lines")
    # geometric mean of replicate measurements at the same n
    by_n = {}
    for ln in lines:
        by_n.setdefault(ln["n_vecs"], []).append(ln)
    ns = sorted(by_n)
    n_small, n_big = ns[0], ns[-1]
    if n_small == n_big:
        sys.exit("fit needs two distinct n_vecs points")

    def gmean(xs):
        return math.exp(sum(math.log(x) for x in xs) / len(xs))

    def agg(n, key, sub):
        return gmean([ln[key][sub] for ln in by_n[n]])

    probes = sorted(lines[0]["probes"])
    print(f"n_vecs: {n_small} (x{len(by_n[n_small])} replicates) -> {n_big}; "
          f"exact pairs x{agg(n_big, 'work', 'exact_pairs') / agg(n_small, 'work', 'exact_pairs'):.1f}, "
          f"banded edges x{agg(n_big, 'work', 'banded_edges') / agg(n_small, 'work', 'banded_edges'):.1f}")
    print(f"{'probe':20} {'t_small':>8} {'t_big':>8} {'ratio':>6} "
          f"{'exp_vs_n':>8} {'exp_vs_pairs':>12} {'floor_share':>11}")
    log_n = math.log(n_big / n_small)
    log_w = math.log(agg(n_big, "work", "exact_pairs") / agg(n_small, "work", "exact_pairs"))
    for p in probes:
        ts = agg(n_small, "probes", p)
        tb = agg(n_big, "probes", p)
        r = tb / ts
        print(f"{p:20} {ts:>8.2f} {tb:>8.2f} {r:>6.2f} "
              f"{math.log(r) / log_n:>8.2f} {math.log(r) / log_w:>12.2f} "
              f"{min(1.0, ts / tb):>11.2f}")


def main() -> None:
    if sys.argv[1] == "fit":
        fit(sys.argv[2])
        return
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
