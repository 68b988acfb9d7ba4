"""Mechanize the driver-window rotation (r12 verdict task #1).

The round driver runs only the FIRST 50 ``queries()`` entries.  The
board holds 100 entries = two 50-slot windows that must SWAP every
round so every entry's driver-green evidence stays <=2 rounds old.
Until round 13 the swap was hand-maintained and memory-dependent — one
forgotten swap would silently halve driver coverage.  These gates make
a forgotten swap a pytest failure instead:

* the head-50 must be DISJOINT from the newest ``CORRECTNESS_r*.json``
  keys (the block the driver just confirmed must rotate OUT of the
  window);
* the head-50 must be EXACTLY the complement block (the rest of the
  board), so the union of two consecutive windows is the whole board;
* the board stays frozen at 100 unique entries (2 windows x 50).

If the board ever grows past 100, the complement check below fails
loudly — re-derive the window policy then rather than letting the
two-round promise silently stretch to three.
"""
from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _latest_correctness() -> tuple[int, set[str]]:
    recs = {}
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            recs[int(m.group(1))] = p
    if not recs:
        pytest.skip("no CORRECTNESS_r*.json records present")
    rnd = max(recs)
    return rnd, set(json.loads(recs[rnd].read_text()))


def _board() -> list[str]:
    import __spark_entry__ as entry

    return list(entry.queries())


def test_board_frozen_at_100_unique():
    board = _board()
    assert len(board) == 100, f"board size {len(board)} != 100"
    assert len(set(board)) == 100, "duplicate queries() keys"


def test_head50_disjoint_from_latest_driver_window():
    rnd, confirmed = _latest_correctness()
    head = set(_board()[:50])
    overlap = sorted(head & confirmed)
    assert not overlap, (
        f"rotation NOT executed: {len(overlap)} head-50 entries were "
        f"already driver-checked in CORRECTNESS_r{rnd}.json "
        f"(e.g. {overlap[:5]}).  Swap the two 50-entry blocks in "
        "__spark_entry__.queries()."
    )


def test_head50_is_exact_complement_of_latest_driver_window():
    rnd, confirmed = _latest_correctness()
    board = _board()
    head, tail = set(board[:50]), set(board[50:])
    # The driver may have checked fewer than 50 (crash mid-run); only
    # enforce the exact-complement property when the record is full.
    if len(confirmed) == 50 and confirmed <= set(board):
        assert head == set(board) - confirmed, (
            f"head-50 is not the exact complement of the "
            f"CORRECTNESS_r{rnd}.json window; two-round coverage "
            "promise is broken"
        )
        assert tail == confirmed
    else:
        # Partial/stale record: at minimum the confirmed names present
        # on the board must all sit in the tail.
        assert (confirmed & set(board)) <= tail


def test_gate_would_fire_on_forgotten_swap():
    """Negative control: if the blocks had NOT been swapped this round
    (i.e. the current tail-50 still led), the disjointness gate must
    fire — otherwise the gate is vacuous and a forgotten rotation slips
    through again."""
    rnd, confirmed = _latest_correctness()
    board = _board()
    unrotated_head = set(board[50:])      # what the head would have been
    assert unrotated_head & confirmed, (
        "gate is vacuous: even the unrotated ordering would pass; "
        "check the CORRECTNESS ledger"
    )
