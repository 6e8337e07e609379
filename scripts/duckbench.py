#!/usr/bin/env python3
"""DuckDB side of the bench comparison: time every oracle SQL from a
Verify dump's oracle_sql.json against the parquet tables of one sf dir.

Usage: python3 scripts/duckbench.py <sfDir> <oracle_sql.json> [runs]

Prints one JSON line mirroring graft.Bench's shape (per-query min over
`runs` executions, default 2). DuckDB materializes each result fully
(fetchall) — the analogue of the Spark side's noop-sink write.
"""
import sys, json, time, glob, os
import duckdb

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sqls = json.load(open(oracle_path))
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t).replace(".parquet", "")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    out, failed = {}, []
    for name in sorted(sqls):
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            try:
                con.execute(sqls[name]).fetchall()
            except Exception as e:
                print(f"[duckbench] {name} failed: {e}", file=sys.stderr)
                best = None
                failed.append(name)
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = best  # null marks a failure — never a near-zero "time"
    ok = [v for v in out.values() if v is not None]
    print(json.dumps({"metric": "total", "value": sum(ok),
                      "unit": "sec", "queries": out, "sf": sf_dir,
                      "engine": "duckdb", "runs": runs,
                      "failed": sorted(set(failed))}))
    if failed:
        # a comparison against a partially-failed run is not a comparison
        sys.exit(1)

if __name__ == "__main__":
    main()
