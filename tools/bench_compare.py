#!/usr/bin/env python3
"""Compare two Bench JSON outputs and flag per-query regressions.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [ratio]

Accepts either the raw Bench line ({"metric":..., "queries":{...}})
or the driver's wrapper ({"parsed": {...}} / {"tail": "..."}). Flags
queries whose new time exceeds ratio x old (default 1.5) AND differ
by more than 0.3 s absolute — sub-second jitter on a shared host is
not a regression signal. Dev-only tool (driver-side python).
"""
import sys, json


def warn_dirty(path, d):
    # round-15 verdict item 5: a clean:false artifact self-identifies
    # as dirty-host — comparisons against it are attribution hazards
    if d.get("clean") is False or (d.get("host_loadavg1") or 0) > 2.0:
        print(f"WARNING: {path} is a DIRTY-HOST artifact "
              f"(clean={d.get('clean')}, loadavg1={d.get('host_loadavg1')}) "
              "— prefer a quiesced clean:true run", file=sys.stderr)


def queries_of(path):
    d = json.load(open(path))
    if "queries" in d:
        warn_dirty(path, d)
        return d["queries"], d.get("value")
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        p = d["parsed"]
        return p["queries"], p.get("value")
    if "tail" in d:  # driver wrapper: last JSON line inside tail text
        for line in reversed(d["tail"].splitlines()):
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                p = json.loads(line[line.index("{"):])
                return p["queries"], p.get("value")
    raise SystemExit(f"{path}: no queries found")


def main(old_path, new_path, ratio=1.5):
    old, old_total = queries_of(old_path)
    new, new_total = queries_of(new_path)
    flagged, improved = [], []
    for q in sorted(set(old) & set(new)):
        o, n = old[q], new[q]
        if n > o * ratio and n - o > 0.3:
            flagged.append((q, o, n))
        elif o > n * ratio and o - n > 0.3:
            improved.append((q, o, n))
    print(f"old total={old_total}s ({len(old)} queries)  "
          f"new total={new_total}s ({len(new)} queries)")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"dropped: {', '.join(only_old)}")
    if only_new:
        print(f"added:   {', '.join(only_new)}")
    for q, o, n in sorted(flagged, key=lambda t: t[1] - t[2]):
        print(f"SLOWER {q}: {o}s -> {n}s ({n/o:.2f}x)")
    for q, o, n in sorted(improved, key=lambda t: t[2] - t[1]):
        print(f"faster {q}: {o}s -> {n}s ({n/o:.2f}x)")
    print(f"== {len(flagged)} regressions past {ratio}x+0.3s ==")
    return 1 if flagged else 0


if __name__ == "__main__":
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], r))
