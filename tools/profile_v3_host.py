#!/usr/bin/env python
"""Profile v3_host_e2e run-to-run variance (r12 verdict task #3).

BENCH_LOCAL.md r12 recorded 16.9 / 16.3 / 25.5 s across three runs of
identical code — a 9.2 s spread on a 16.9 s median, by far the largest
on the board.  This harness attributes the spread: it runs the bench's
exact v3_host_e2e workload N times in one session and records, per run,

* wall per PLANNER TOOL call (monkeypatched around ``V3Host._run_tool``
  — the pipeline is a sequential tool loop, so per-tool walls sum to
  ~the run wall),
* JVM GC time delta (GarbageCollectorMXBeans, all collectors),
* Python GC collections delta,
* pinned-RDD count before/after (checkpoint churn).

Usage: ``python tools/profile_v3_host.py [n_runs]`` → one JSON line per
run + a summary table on stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from llmxmapreduce_spark.pipelines import v3_host as vh  # noqa: E402
from llmxmapreduce_spark.session import get_spark  # noqa: E402


def jvm_gc_ms(sc) -> float:
    beans = sc._jvm.java.lang.management.ManagementFactory \
        .getGarbageCollectorMXBeans()
    return float(sum(b.getCollectionTime() for b in beans))


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-v3")
    sc = spark.sparkContext

    tool_walls: list[dict[str, float]] = []
    orig_run_tool = vh.V3Host._run_tool

    def timed_run_tool(self, round_num, decision):
        t0 = time.perf_counter()
        try:
            return orig_run_tool(self, round_num, decision)
        finally:
            name = decision.get("tool_name") or "?"
            w = tool_walls[-1]
            w[name] = round(w.get(name, 0.0) + time.perf_counter() - t0, 3)

    vh.V3Host._run_tool = timed_run_tool
    try:
        import gc
        for i in range(n_runs):
            tool_walls.append({})
            gc_before = jvm_gc_ms(sc)
            py_gc_before = sum(s["collections"] for s in gc.get_stats())
            pinned_before = sc._jsc.getPersistentRDDs().size()
            t0 = time.perf_counter()
            df = entrymod.q_v3_host_transcript(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            wall = round(time.perf_counter() - t0, 3)
            rec = {
                "run": i,
                "wall_sec": wall,
                "jvm_gc_ms": round(jvm_gc_ms(sc) - gc_before, 1),
                "py_gc_collections":
                    sum(s["collections"] for s in gc.get_stats())
                    - py_gc_before,
                "pinned_rdds_delta":
                    sc._jsc.getPersistentRDDs().size() - pinned_before,
                "tools": dict(sorted(tool_walls[-1].items(),
                                     key=lambda kv: -kv[1])),
            }
            print(json.dumps(rec), flush=True)
    finally:
        vh.V3Host._run_tool = orig_run_tool

    walls = [sum(w.values()) for w in tool_walls]
    names = sorted({n for w in tool_walls for n in w})
    print("\nper-tool wall (sec) across runs:", file=sys.stderr)
    for n in names:
        series = [w.get(n, 0.0) for w in tool_walls]
        print(f"  {n:28s} " + " ".join(f"{x:6.2f}" for x in series)
              + f"   spread={max(series) - min(series):.2f}",
              file=sys.stderr)
    print(f"  {'SUM(tools)':28s} "
          + " ".join(f"{x:6.2f}" for x in walls), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
