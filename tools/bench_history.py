#!/usr/bin/env python
"""Per-query bench history comparison (r12 verdict task #2).

BENCH_LOCAL.json is overwritten every bench run, so per-query min drift
across rounds used to be unattributable (the r12 verdict's 22.67 s →
26.6 s idle-floor question).  The protocol is now: after each round's
bench run, ``cp BENCH_LOCAL.json BENCH_LOCAL_r<N>.json``; this tool
diffs any two archived records query by query.

Usage::

    python tools/bench_history.py                 # newest two archives
    python tools/bench_history.py r12 r13         # explicit rounds

Prints a markdown table of per-query MIN (the contention-immune
statistic) with absolute and relative deltas, sorted by |delta|, plus
the suite19/production totals and loadavg stamps of both records.
"""
from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _archives() -> dict[int, Path]:
    out = {}
    for p in REPO.glob("BENCH_LOCAL_r*.json"):
        m = re.fullmatch(r"BENCH_LOCAL_r(\d+)\.json", p.name)
        if m:
            out[int(m.group(1))] = p
    return out


def _load(p: Path) -> dict:
    return json.loads(p.read_text())


def _mins(rec: dict) -> dict[str, float]:
    # "mins" (r12+ protocol) with a fallback to the medians table
    return rec.get("mins") or rec.get("queries") or {}


def main() -> int:
    arch = _archives()
    if len(sys.argv) == 3:
        a, b = (int(sys.argv[1].lstrip("r")), int(sys.argv[2].lstrip("r")))
        missing = [r for r in (a, b) if r not in arch]
        if missing:
            print(f"no archived BENCH_LOCAL_r*.json for round(s) "
                  f"{missing}; have {sorted(arch)}")
            return 1
    else:
        if len(arch) < 2:
            print("need two archived BENCH_LOCAL_r*.json records; "
                  f"have {sorted(arch)}")
            return 1
        a, b = sorted(arch)[-2:]
    ra, rb = _load(arch[a]), _load(arch[b])
    ma, mb = _mins(ra), _mins(rb)
    shared = sorted(set(ma) & set(mb))
    only_a = sorted(set(ma) - set(mb))
    only_b = sorted(set(mb) - set(ma))

    rows = []
    for q in shared:
        d = mb[q] - ma[q]
        rel = (d / ma[q] * 100) if ma[q] else float("inf")
        rows.append((abs(d), q, ma[q], mb[q], d, rel))
    rows.sort(reverse=True)

    print(f"## Per-query min drift r{a} → r{b} "
          f"(loadavg r{a}={ra.get('loadavg')}, r{b}={rb.get('loadavg')})\n")
    print(f"| query | r{a} min s | r{b} min s | Δs | Δ% |")
    print("|---|---|---|---|---|")
    for _ab, q, va, vb, d, rel in rows:
        print(f"| {q} | {va:.2f} | {vb:.2f} | {d:+.2f} | {rel:+.0f}% |")
    for label, rec in ((f"r{a}", ra), (f"r{b}", rb)):
        print(f"\n{label}: suite19_min={rec.get('suite19_min_sec')} "
              f"suite19_median={rec.get('suite19_sec')} "
              f"production={rec.get('production_sec')} "
              f"total={rec.get('value')}")
    if only_a:
        print(f"\nonly in r{a}: {', '.join(only_a)}")
    if only_b:
        print(f"only in r{b}: {', '.join(only_b)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
