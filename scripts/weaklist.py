#!/usr/bin/env python3
"""Scripted weak-list recount over the FULL query surface.

Round-11 lesson (VERDICT r11 "What's wrong" #2): the weak list must be
recomputed over ALL queries each round, not over last round's members —
q156 regressed 0.62 -> 0.83 s / 2.1x and was missed because only the
previous list was re-checked. This script IS the claim: BASELINE.md's
per-round record must quote its output verbatim.

Criterion (unchanged since round 9): weak = Spark time > 2x DuckDB time
AND Spark time >= 0.7 s, computed on the per-query MIN across the given
bench files (pass a same-hour pair of each engine to absorb host drift).

Adjudicated floors — queries whose excess is documented as an accepted
engine floor in BASELINE.md — are annotated, not hidden: they print in
the report with their anchor, and only UNADJUDICATED entries count
toward the weak total.

Usage: weaklist.py --spark BENCH_local_a.json [BENCH_local_b.json ...]
                   --duck BENCH_duckdb_a.json [BENCH_duckdb_b.json ...]
                   [--probe "CALM wall=... q59=...s ..."]

--probe takes the stormprobe.sh output line for the measurement window
verbatim. The window is certified CALM-strict ONLY when that line's
verdict reads CALM (stormprobe's three-band gate: CALM / MARGINAL /
STORM); without a CALM probe line the report refuses adjudication
labeling — entries print as informational and the round must either
re-measure in a calm window or carry them unadjudicated (r13 verdict
item 4: three rounds of weak-list adjudications hung on a
non-machine-checkable "calm window" claim).
"""
import json
import re
import sys

# query -> BASELINE.md adjudication anchor. Add entries ONLY when a
# data-backed floor record exists in BASELINE.md; the report still
# prints these lines so every round re-sees them.
ADJUDICATED = {
    "q07_symmetric_matchups":
        "BASELINE.md rounds 8-10: all-broadcast post-AQE plan; "
        "multi-stage scheduling floor (twice-adjudicated)",
    "q159_incremental_clusters":
        "BASELINE.md round 9: per-round RDD CC action latency on a toy "
        "delta graph; design is O(batch) at scale",
    "q53_approx_percentile":
        "BASELINE.md round 11: FloorProbe-backed sketch scan+exchange "
        "floor (accuracy=1000, exec min 0.53-0.69 s)",
    "q76_mixture_sampling":
        "BASELINE.md round 12: two-linear-scan + broadcast-ladder floor; "
        "0.66 s (under bar) in the r11 calm pair on unchanged code",
    "q138_quantile_drift":
        "BASELINE.md round 12: bounded quantCdf grid, one events scan; "
        "0.52 s (under bar) in the r11 calm pair on unchanged code",
    "q155_kcenter_coreset":
        "BASELINE.md round 12: driver-side batched k-center iteration "
        "(analyze-bound); 0.63 s (under bar) in the r11 calm pair",
}

RATIO_BAR = 2.0
ABS_BAR = 0.7


def load(path):
    txt = open(path).read()
    m = re.search(r'\{"metric".*\}', txt)
    if m is None:
        sys.exit(f"weaklist: {path} contains no graft.Bench JSON line "
                 "(expected {\"metric\":...})")
    return json.loads(m.group(0))["queries"]


def min_over(files):
    out = {}
    for f in files:
        for q, t in load(f).items():
            out[q] = min(out.get(q, float("inf")), t)
    return out


def main():
    argv = sys.argv[1:]
    if "--spark" not in argv or "--duck" not in argv:
        print(__doc__)
        sys.exit(2)
    probe = None
    if "--probe" in argv:
        pi = argv.index("--probe")
        probe = argv[pi + 1]
        argv = argv[:pi] + argv[pi + 2:]
    si, di = argv.index("--spark"), argv.index("--duck")
    spark_files = argv[si + 1:di] if si < di else argv[si + 1:]
    duck_files = argv[di + 1:si] if di < si else argv[di + 1:]
    if not spark_files or not duck_files:
        sys.exit("weaklist: need at least one file after --spark and --duck")
    spark, duck = min_over(spark_files), min_over(duck_files)
    if not set(spark) & set(duck):
        sys.exit("weaklist: the spark and duckdb files share no query names "
                 "— wrong file pairing?")

    rows = []
    for q in sorted(spark):
        ts = spark[q]
        td = duck.get(q)
        if td is None:
            continue
        ratio = ts / max(td, 1e-9)
        if ts >= ABS_BAR and ratio > RATIO_BAR:
            rows.append((ratio, ts, td, q))
    rows.sort(reverse=True)

    calm = probe is not None and probe.startswith("CALM ")
    if calm:
        print(f"window: CALM-strict (probe: {probe})")
    elif probe is not None:
        print(f"window: NOT certified calm (probe: {probe}) — entries below "
              "are INFORMATIONAL; do not adjudicate or de-list from them")
    else:
        print("window: no --probe line supplied — entries below are "
              "INFORMATIONAL; adjudication requires a CALM stormprobe line")
    common = [q for q in spark if q in duck]
    tot_s = sum(spark[q] for q in common)
    tot_d = sum(duck[q] for q in common)
    print(f"weaklist: {len(common)} queries compared "
          f"(spark min-of-{len(spark_files)} {tot_s:.1f} s, "
          f"duckdb min-of-{len(duck_files)} {tot_d:.1f} s, "
          f"total ratio {tot_s / tot_d:.2f}x); "
          f"criterion: spark > {RATIO_BAR:g}x duckdb AND spark >= {ABS_BAR:g} s")
    unadj = []
    for ratio, ts, td, q in rows:
        anchor = ADJUDICATED.get(q)
        tag = f"adjudicated ({anchor})" if anchor else "UNADJUDICATED"
        print(f"  {q}: spark {ts:.2f} s vs duckdb {td:.2f} s = "
              f"{ratio:.1f}x  [{tag}]")
        if not anchor:
            unadj.append(q)
    print(f"weak (unadjudicated): {len(unadj)}"
          + (f" -> {', '.join(unadj)}" if unadj else ""))
    sys.exit(0)


if __name__ == "__main__":
    main()
