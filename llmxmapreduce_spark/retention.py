"""Checkpoint-block release helpers (the r12 retention discipline).

``localCheckpoint(eager=True)`` blocks have truncated lineage, are never
evicted by storage pressure, and — the trap this module exists to
prevent — are NOT released by ``DataFrame.unpersist()``: that call goes
to the cache manager, which knows nothing of checkpoint RDDs (one tiny
``connected_components`` call measurably leaked 4 pinned frames while
dutifully calling it).  Release must go through the JVM-side
``getPersistentRDDs`` registry.

Usage pattern (labelprop.py / pagerank.py / components.py /
v1_qa.py / v2_survey.py / corpus_prep.py / media_prep.py)::

    pinned = pinned_ids(sc)            # snapshot before a checkpoint
    df = df.localCheckpoint(eager=True)
    new_ids = pinned_ids(sc) - pinned  # ids this checkpoint created
    ...                                 # once superseded:
    release(sc, old_ids)

Two invariants every call site keeps:

- **Caller-cache shield.**  A DataFrame cache registers in
  ``getPersistentRDDs`` lazily, at first materialization — which for a
  caller's cache happens INSIDE the callee's first scan of its input.
  The first checkpoint's id-diff therefore may contain caller caches
  and must never be released; every loop keeps its first
  materialization's ids pinned (the shield) and only sweeps ids
  created after it.
- **Release after supersede.**  An id set is released only once the
  frame that replaces it is eagerly materialized, so the old blocks
  have provably had their last read (truncated lineage means they
  could never be recomputed).
"""

from __future__ import annotations

__all__ = ["pinned_ids", "release"]


def pinned_ids(sc) -> set:
    """Ids of every RDD currently registered persistent on the JVM side
    (caches AND local checkpoints)."""
    return set(sc._jsc.getPersistentRDDs().keySet().toArray())


def release(sc, ids: set) -> None:
    """Unpersist the given RDD ids (no-op for ids no longer registered).
    Safe only for ids whose frames are provably never read again — a
    released localCheckpoint block cannot be recomputed."""
    jmap = sc._jsc.getPersistentRDDs()
    for rid in ids:
        if jmap.containsKey(rid):
            jmap.get(rid).unpersist()
