#!/usr/bin/env python3
"""Full-surface scale-growth report: compare two graft.Bench JSON lines
(e.g. sf0.1 vs the 100x replica from scripts/make_sf1.py) and flag
superlinear growth.

The replica multiplies only the corpus tables (documents/embeddings),
so TPC-H-only queries should be ~flat; corpus queries should grow at
most ~linearly with the replica factor. A growth ratio well above the
factor on a corpus query = a scale bug (quadratic kernel, unbounded
panel, collision blowup).

Usage: scalecheck.py base_bench.json big_bench.json [factor]
"""
import json
import sys
import re


def load(p):
    txt = open(p).read()
    m = re.search(r'\{"metric".*\}', txt)
    return json.loads(m.group(0))


def main():
    base, big = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 100.0
    rows = []
    for q, t0 in base["queries"].items():
        t1 = big["queries"].get(q)
        if t1 is None:
            continue
        rows.append((t1 / max(t0, 1e-9), t0, t1, q))
    rows.sort(reverse=True)
    print(f"{'growth':>7} {'base_s':>7} {'big_s':>7}  query   (factor={factor:g})")
    for g, t0, t1, q in rows:
        flag = " <-- SUPERLINEAR?" if g > factor and t1 > 1.0 else ""
        print(f"{g:7.1f} {t0:7.2f} {t1:7.2f}  {q}{flag}")
    print(f"\ntotals: base {sum(base['queries'].values()):.1f}s, "
          f"big {sum(big['queries'].values()):.1f}s")


if __name__ == "__main__":
    main()
