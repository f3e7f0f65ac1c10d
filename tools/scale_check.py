#!/usr/bin/env python3
"""Scale-linearity guard over two graft.Bench JSON lines.

Usage: python3 tools/scale_check.py <bench_lo.json> <bench_hi.json> <step>

<step> is the data-scale multiple between the two runs (10 for
sf0.1 -> sf1). For every query present in both runs the tool prints
the wall-time ratio and flags any query whose ratio exceeds
3 x <step> ("3x-linear", the round-10 verdict's envelope) after an
absolute floor of 0.5 s on the hi-side time (sub-second queries are
overhead-dominated and their ratios are noise, not complexity
evidence). Exit code 1 if any query is flagged or errored at the
high scale.

Dev-side tool (python, like tools/check.py); the shipped library
does not depend on it.
"""
import sys, json

def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip())
    return d

def main(lo_path, hi_path, step):
    lo, hi = load(lo_path), load(hi_path)
    qlo, qhi = lo["queries"], hi["queries"]
    flagged, errored, rows = [], list(hi.get("errors", [])), []
    for name in sorted(set(qlo) & set(qhi)):
        tl, th = qlo[name], qhi[name]
        if tl < 0 or th < 0:
            continue
        ratio = th / tl if tl > 0 else float("inf")
        bad = th >= 0.5 and ratio > 3.0 * step
        rows.append((name, tl, th, ratio, bad))
        if bad:
            flagged.append(name)
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':42s} {'lo_s':>8s} {'hi_s':>8s} {'ratio':>7s}")
    for name, tl, th, ratio, bad in rows[:25]:
        mark = " <-- OUTSIDE 3x-linear" if bad else ""
        print(f"{name:42s} {tl:8.3f} {th:8.3f} {ratio:7.2f}{mark}")
    tot_lo = sum(v for v in qlo.values() if v >= 0)
    tot_hi = sum(v for v in qhi.values() if v >= 0)
    tot_ratio = f"{tot_hi/tot_lo:.2f}" if tot_lo > 0 else "n/a (lo total is 0)"
    print(f"\ntotals: lo={tot_lo:.1f}s hi={tot_hi:.1f}s "
          f"ratio={tot_ratio} (step={step}, envelope={3*step}x)")
    # a renamed/dropped query must not silently vanish from the sweep:
    # report the symmetric difference and treat it as a failure
    only_lo, only_hi = sorted(set(qlo) - set(qhi)), sorted(set(qhi) - set(qlo))
    if only_lo:
        print(f"only in {lo_path}: {only_lo}")
    if only_hi:
        print(f"only in {hi_path}: {only_hi}")
    print(f"flagged: {flagged or 'none'}")
    print(f"errored at hi scale: {errored or 'none'}")
    return 1 if (flagged or errored or only_lo or only_hi) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], float(sys.argv[3])))
