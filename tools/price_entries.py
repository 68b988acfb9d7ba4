#!/usr/bin/env python
"""Price a subset of board/bench queries at one scale factor.

Same protocol as bench.py (noop sink, N runs, per-query medians +
spread) but over an explicit query list, so new board entries get their
sf1/sf5 scale rows (BASELINE.md) without re-pricing the whole suite.

Usage: python tools/price_entries.py SF_DIR query [query ...]
       SPARK_GRAFT_BENCH_RUNS=3 python tools/price_entries.py ...
Prints one JSON line: {"sf_dir": ..., "queries": {name: median_sec},
"spread_sec": {...}, "runs": {...}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from llmxmapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        print("usage: python tools/price_entries.py SF_DIR query "
              "[query ...]", file=sys.stderr)
        return 2
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark("price_entries")
    qs = entrymod.queries()
    import bench  # bench-only production shapes price too

    out_q, out_runs, out_spread = {}, {}, {}
    for name in names:
        fn = (bench.BENCH_ONLY.get(name) or qs.get(name)
              or entrymod.RETIRED_QUERIES.get(name))
        if fn is None:
            print(f"SKIP {name}: not found", file=sys.stderr)
            continue
        samples = []
        for _ in range(n_runs):
            # release prior query state so timings are independent
            spark.catalog.clearCache()
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs() \
                    .values():
                jrdd.unpersist()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
        out_q[name] = round(statistics.median(samples), 3)
        out_runs[name] = samples
        out_spread[name] = round(max(samples) - min(samples), 3)
        print(f"{name}: {out_q[name]}s {samples}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out_q,
                      "spread_sec": out_spread, "runs": out_runs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
