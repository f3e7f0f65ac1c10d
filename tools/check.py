#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle differential check.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/<name>/ parquet (Spark result) and
<verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sfDir parquet tables registered as views, and compares as
column-name-sorted, row-sorted value multisets.

Dev-only tool (driver-side python); the shipped Scala library does
not depend on it.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [c for c in sorted(cols)], sorted(out)

def main(sf_dir, out_dir, json_out=None):
    import os

    def connect():
        c = duckdb.connect()
        for t in TABLES:
            # driver testdata is one file per table; Spark-written
            # scale data (ScaleUp) is a directory of part files
            p = f"{sf_dir}/{t}.parquet"
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        return c

    con = connect()
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_typewarn = n_skip = 0
    results = {}

    # Optional per-oracle wall budget (seconds) via GRAFT_CHECK_TIMEOUT:
    # at the 10x scale a handful of oracles are intractable in DuckDB
    # (the unrolled pagerank chains); a budget records them as ORACLE
    # SKIPs instead of hanging the whole differential. 0/unset = off
    # (the driver-equivalent sf0.01 posture).
    budget = float(os.environ.get("GRAFT_CHECK_TIMEOUT", "0") or 0)

    def run_budgeted(sql):
        nonlocal con
        if budget <= 0:
            rows = con.execute(sql).fetchall()
            return rows, [d[0] for d in con.description], False
        import threading
        out = {}
        def work():
            try:
                out["rows"] = con.execute(sql).fetchall()
                out["cols"] = [d[0] for d in con.description]
            except Exception as e:
                out["err"] = e
        th = threading.Thread(target=work, daemon=True)
        th.start(); th.join(budget)
        timed_out = th.is_alive()
        if timed_out:
            con.interrupt()
            th.join(30)
            if th.is_alive():
                # worker survived the interrupt and still owns the
                # connection (DuckDB connections are not thread-safe):
                # abandon it and continue on a fresh one
                con = connect()
            else:
                # the worker may have FINISHED between the is_alive
                # check and the interrupt, leaving a stale interrupt
                # flag that would poison the next oracle — clear it
                # with a sacrificial query
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:
                    pass
        if "err" in out and not timed_out:
            raise out["err"]
        if timed_out:
            return None, None, True
        return out["rows"], out["cols"], False
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            results[name] = {"missing_output": True}
            n_fail += 1
            continue
        try:
            s = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
            scols = [d[0] for d in con.description]
            o, ocols, timed_out = run_budgeted(sql)
            if timed_out:
                print(f"SKIP {name}: oracle exceeded {budget:.0f}s budget")
                results[name] = {"oracle_timeout": True}
                n_skip += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: {e}")
            results[name] = {"error": str(e)}
            n_fail += 1
            continue
        # Type-parity guard (round-9 lesson): DuckDB SUM(int) returns
        # HUGEINT (int128); python fetchall() hides that as a plain int,
        # but the driver's comparator normalizes int128 differently than
        # the Spark output's int64 — every round-8 hash-red query traced
        # to exactly this. Flag any oracle output column whose DuckDB
        # type has no Spark parquet counterpart so the mismatch is
        # visible LOCALLY, not just in the driver artifact.
        try:
            desc = con.execute(
                f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0").fetchall()
            exotic = [(c[0], c[1]) for c in desc
                      if c[1] in ("HUGEINT", "UHUGEINT")
                      or c[1].startswith("DECIMAL")]
            for col, typ in exotic:
                print(f"TYPEWARN {name}: oracle col {col} is {typ} "
                      f"(cast to BIGINT/DOUBLE in the SQL)")
            # counted per QUERY (not per column) and separately from
            # n_fail, so n_fail stays "number of value-failing queries"
            # and a typed-but-value-equal query is reported as what it
            # is; the exit code still trips because the DRIVER comparator
            # diverges on int128/decimal even when local values match
            if exotic:
                n_typewarn += 1
        except Exception:
            pass
        sc, sr = canon(scols, s)
        oc, orr = canon(ocols, o)
        res = {"rows": len(sr), "oracle_rows": len(orr),
               "schema_match": sc == oc, "hash_match": sr == orr}
        results[name] = res
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            n_fail += 1
        elif sr != orr:
            diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orr)} first diffs={diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_typewarn} typewarn, "
          f"{n_skip} oracle-skip ==")
    if json_out:
        # every query gets a results[] entry — value failures, thrown
        # oracles ({"error"}), and missing spark outputs
        # ({"missing_output"}) all count in n_fail, so the artifact
        # can never read cleaner than the stdout above
        ok = sum(1 for v in results.values()
                 if v.get("schema_match") and v.get("hash_match"))
        skipped = sum(1 for v in results.values() if v.get("oracle_timeout"))
        # provenance: WHEN this differential ran and against WHICH
        # commit — a re-run whose results are byte-identical to a
        # prior artifact must still be distinguishable as a fresh
        # witness of the current tree (round-13 verdict: the sf1
        # artifact could not prove it postdated a late source swap)
        import datetime, subprocess
        try:
            head = subprocess.run(
                ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "rev-parse", "HEAD"],
                capture_output=True, text=True, timeout=10).stdout.strip()
        except Exception:
            head = ""
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": ok,
                       "n_fail": len(results) - ok - skipped,
                       "n_oracle_skip": skipped,
                       "generated_at": datetime.datetime.now(
                           datetime.timezone.utc).isoformat(timespec="seconds"),
                       "git_head": head,
                       "queries": results}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    # 0 = all green; 1 = value/schema failures or type warnings;
    # 3 = green except oracle-budget skips (unproven, not wrong)
    if n_fail or n_typewarn:
        return 1
    return 3 if n_skip else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
