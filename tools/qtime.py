#!/usr/bin/env python
"""Time individual bench queries in one session (r13 optimization loop).

Usage:
    python tools/qtime.py [-n RUNS] [--plan OUT.txt] name [name ...]

Same methodology as bench.py (1 discarded warm-up + N timed runs, noop
sink, median/min), but scoped to the named queries so an optimization
iteration costs seconds, not a full 106-query sweep.  `--plan DIR`
additionally writes `<DIR>/<name>.txt` with `explain("formatted")` for
each named query (the plans/r13 before/after evidence).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from llmxmapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--plan", default=None,
                    help="directory to write <name>.txt formatted plans")
    ap.add_argument("--suffix", default="",
                    help="filename suffix for plan files (e.g. _before)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qtime")
    queries = entrymod.queries()
    out: dict[str, dict] = {}
    for name in args.names:
        fn = (benchmod.BENCH_ONLY.get(name) or queries.get(name)
              or entrymod.RETIRED_QUERIES.get(name))
        if fn is None:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plan,
                                   f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        samples = []
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        for i in range(args.n + 1):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            if i > 0:
                samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"median": round(statistics.median(samples), 3),
                     "min": min(samples), "runs": samples}
        print(f"{name}: median={out[name]['median']} min={out[name]['min']} "
              f"runs={samples}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
