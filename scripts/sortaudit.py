#!/usr/bin/env python3
"""ORDER BY double-execution audit over a graft.Bench event log.

A global ORDER BY's RangePartitioner SAMPLES its child; when the
pre-sort stage is exchange-free the whole stage runs twice (sample
pass + real pass, SCALE.md round 13). The signature in the Spark
event log: within one timed `save` SQL execution, two jobs of
near-identical duration. This script groups jobs by root SQL
execution, pairs the timed save executions with the bench's sorted
query names, and flags queries whose two largest jobs are both
>= --min-sec and within 40% of each other.

Usage: sortaudit.py <decompressed-eventlog.json> <bench.json> [--min-sec 0.2]

Flagged != guilty: AQE stage materializations racing a cold cache
(deliberate twin scans) match the same signature — read the query
before prescribing Det.ordered. The script is a finder, not a judge.
"""
import json
import sys


def main():
    ev_path, bench_path = sys.argv[1], sys.argv[2]
    min_sec = 0.2
    if "--min-sec" in sys.argv:
        min_sec = float(sys.argv[sys.argv.index("--min-sec") + 1])

    bench = json.load(open(bench_path))
    names = sorted(bench["queries"])

    execs = {}      # execId -> description
    jobexec = {}    # jobId -> execId
    jobstart = {}
    jobs = {}       # execId -> [durations]
    for line in open(ev_path, errors="ignore"):
        try:
            e = json.loads(line)
        except ValueError:
            continue
        if not isinstance(e, dict):
            continue
        ev = e.get("Event", "")
        if "SQLExecutionStart" in ev:
            execs[str(e["executionId"])] = e.get("description", "")
        elif ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            jobstart[jid] = e["Submission Time"]
            props = e.get("Properties", {})
            jobexec[jid] = props.get("spark.sql.execution.root.id",
                                     props.get("spark.sql.execution.id"))
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            ex = jobexec.get(jid)
            if ex is not None and jid in jobstart:
                jobs.setdefault(ex, []).append(
                    (e["Completion Time"] - jobstart[jid]) / 1000.0)

    # Preferred pairing: Bench name-tags each timed execution's
    # description as "graft-bench:<query>:rep<r>" — match by NAME,
    # which survives reps > 1 and mid-run failures. For each query,
    # audit the rep with the smallest job total (least host noise).
    tagged = {}  # name -> [execId]
    for x, desc in execs.items():
        if desc and desc.startswith("graft-bench:"):
            parts = desc.split(":")
            if len(parts) >= 2:
                tagged.setdefault(parts[1], []).append(x)
    if tagged:
        pairs = [(name, min(tagged[name], key=lambda x: sum(jobs.get(x, []))))
                 for name in names if name in tagged]
        missing = [n for n in names if n not in tagged]
        if missing:
            print(f"WARNING: {len(missing)} bench queries have no tagged "
                  f"execution (failed before submit?): {missing[:8]}")
    else:
        # legacy logs without tags: submission order == sorted query
        # order ONLY holds at reps=1 with zero failures — bail rather
        # than attribute flags to the wrong queries (r13 ADVICE)
        saves = [x for x in sorted(execs, key=int)
                 if "save at Bench.scala" in execs[x]]
        if len(saves) != len(names):
            sys.exit(f"ERROR: untagged log with {len(saves)} save execs vs "
                     f"{len(names)} queries (reps != 1, or a query failed) — "
                     "order-pairing would misattribute flags; re-run with a "
                     "name-tagging Bench build")
        pairs = list(zip(names, saves))
    flagged = 0
    for name, ex in pairs:
        ds = sorted(jobs.get(ex, []), reverse=True)
        if len(ds) >= 2 and ds[1] >= min_sec and ds[1] / ds[0] >= 0.6:
            flagged += 1
            print(f"FLAG {name:38s} top jobs: "
                  + ", ".join(f"{d:.2f}s" for d in ds[:4]))
    print(f"\n{flagged} flagged of {len(pairs)} "
          f"(threshold: 2nd job >= {min_sec}s and >= 60% of 1st)")


if __name__ == "__main__":
    main()
