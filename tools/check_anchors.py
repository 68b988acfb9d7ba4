#!/usr/bin/env python
"""Anchor auditor for COVERAGE.md (r12 verdict task #4).

COVERAGE.md is the judge-facing map from SURVEY §2 inventory to code,
and its anchors drift when refactors move lines or rename functions
(the r12 verdict's "v1_qa.py:85→86" class).  This tool makes the table
mechanically auditable:

* every repo-resolvable ``path.py`` mentioned in COVERAGE.md must
  exist (relative to repo root or ``llmxmapreduce_spark/``);
* every ``path.py:NN`` line anchor must land ON a ``def``/``class``
  line (decorators count — the anchor names the definition);
* every backticked identifier that immediately follows a path token
  ("sources/jsonl.py ``load_surveys``") must occur in that file's
  text, so a renamed function fails the audit instead of leaving a
  stale pointer.

Bare filenames that do not resolve inside the repo (e.g. the
reference-repo citations ``html_extrator.py:45``) are deliberately
skipped: they document the REFERENCE implementation being mirrored and
this repo cannot pin the reference's line numbering.

Exit 0 = clean; exit 1 prints one line per stale anchor.  Wrapped by
``tests/test_anchor_audit.py`` so drift fails pytest.
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "llmxmapreduce_spark"

# a path token: word/slash chars ending in .py, optional :NN or :NN-NN
_PATH_RE = re.compile(r"(?P<path>[A-Za-z_][\w./-]*\.py)(?::(?P<line>\d+)(?:-\d+)?)?")
_TICK_RE = re.compile(r"`([^`]+)`")
_IDENT_RE = re.compile(r"^[A-Za-z_]\w*$")
# after a path, backticked names may follow joined by spaces, '+', '/',
# ',' and short words like "and" before the next path or cell boundary
_TRAILER_STOP = re.compile(r"[|]|[A-Za-z_][\w./-]*\.py")


def _resolve(path: str) -> Path | None:
    for base in (REPO, PKG):
        p = base / path
        if p.is_file():
            return p
    return None


def _is_def_line(line: str) -> bool:
    s = line.strip()
    return s.startswith(("def ", "class ", "@", "async def "))


def audit(md_path: Path) -> list[str]:
    problems: list[str] = []
    text = md_path.read_text()
    file_cache: dict[Path, str] = {}

    for lineno, row in enumerate(text.splitlines(), 1):
        for m in _PATH_RE.finditer(row):
            path, ln = m.group("path"), m.group("line")
            resolved = _resolve(path)
            if resolved is None:
                # reference-repo citation or prose filename: skip, but a
                # path WITH a directory component is repo-shaped and its
                # absence is a real stale anchor — unless it resolves
                # somewhere under the (read-only) reference checkout
                if "/" in path and not path.startswith(
                        ("src/", "LLMxMapReduce", "scripts/")):
                    ref = Path("/root/reference")
                    tail = path.split("/")[-1]
                    if not (ref.is_dir() and list(ref.rglob(tail))):
                        problems.append(
                            f"{md_path.name}:{lineno}: path not found: "
                            f"{path}")
                continue
            src = file_cache.setdefault(resolved, resolved.read_text())
            src_lines = src.splitlines()
            if ln is not None:
                n = int(ln)
                if n < 1 or n > len(src_lines):
                    problems.append(
                        f"{md_path.name}:{lineno}: {path}:{n} is past "
                        f"EOF ({len(src_lines)} lines)")
                elif not _is_def_line(src_lines[n - 1]):
                    problems.append(
                        f"{md_path.name}:{lineno}: {path}:{n} does not "
                        f"land on a def/class line "
                        f"(got: {src_lines[n - 1].strip()[:60]!r})")
            # backticked identifiers in the trailer after this path
            trailer = row[m.end():]
            stop = _TRAILER_STOP.search(trailer)
            if stop:
                trailer = trailer[:stop.start()]
            for name in _TICK_RE.findall(trailer):
                if not _IDENT_RE.match(name):
                    continue        # expression/prose, not an identifier
                # word-boundary match, not substring: a renamed
                # `load_surveys` must not pass on load_surveys_v2
                if not re.search(rf"\b{re.escape(name)}\b", src):
                    problems.append(
                        f"{md_path.name}:{lineno}: `{name}` not found "
                        f"in {path} (renamed?)")
    return problems


def main() -> int:
    targets = [Path(a) for a in sys.argv[1:]] or [REPO / "COVERAGE.md"]
    problems: list[str] = []
    for t in targets:
        problems += audit(t)
    for p in problems:
        print(p)
    print(f"{'STALE ' if problems else ''}anchors: {len(problems)} problem(s)"
          f" across {len(targets)} file(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
