"""Connected components + cluster-level dedup (scale extension).

Turns near-duplicate PAIRS (from ``minhash_dedup_pairs``, the cosine
near-dup operator, or simhash collisions) into CLUSTERS and a canonical
representative per cluster — the step a training-data pipeline actually
needs after candidate generation: "keep ONE copy per near-dup group".
Pairs are not transitively closed (A~B and B~C does not list A~C), so
dropping ``id_b`` of every pair over-deletes and dropping nothing
under-deletes; the component root is the principled keep-set.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14).  Converges in
O(log n) rounds on ANY graph shape — including the long near-dup chains
that defeat naive label propagation (whose round count is the graph
diameter).  Each star pass computes the per-node neighborhood minimum
with a window over ONE hash exchange of the (symmetrized) edge set —
r13 optimization: the groupBy(min)+self-join formulation scanned and
shuffled the edge set twice per star (edges into the join AND partial
mins) where the window needs one exchange plus an in-partition sort;
measured ~20-35%% faster per round at sf0.1 with identical labels.  No
driver-side graph state, no vertex broadcast, so the edge set may be
arbitrarily larger than one machine.  GraphFrames implements the same
scheme on RDDs; this is a dependency-free DataFrame formulation.

Scale notes (100 TB case):
- Shuffles carry (id, id) pairs only — never document text.
- Lineage is cut with an eager ``localCheckpoint`` per round; iterative
  self-referential plans otherwise grow exponentially.
- Convergence is detected with an O(|E|) aggregate fingerprint
  (count + sum of xxhash64) that rides the round's checkpoint action as
  a ``DataFrame.observe`` metric (r13: one job per round, not two) —
  never a driver-side collect of edges.

Correctness gate: pytest ground truth vs an exact union-find
(tests/test_components.py) on fixed + randomized graphs; off the
50-entry oracle board by design (the board is capped), priced in
bench.py via the BENCH_ONLY registry.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F
from llmxmapreduce_spark.retention import pinned_ids, release


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


# Neighborhood minimum per node: min("v") over a partition-only window —
# one hash exchange of the edge rows, an in-partition sort, no join and
# no second scan.  (The previous groupBy("u").min + self-join on "u"
# moved the same edge rows through its own exchange AND shuffled the
# partial mins, then built a join hash table; window-min replaces all of
# that with one sort.  Skew behavior is unchanged: a hot node's edges
# land on one task under either plan.)  Exact integer/string min, so
# round outputs — not just the fixed point — are bit-identical to the
# join formulation.  (A function, not a module constant: Column
# construction needs an active SparkContext.)
def _nbr_min():
    return F.min("v").over(Window.partitionBy("u"))


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    b = _symmetrize(e)
    # window BEFORE the v > u filter: mn must range over ALL of Γ(u)
    return (
        b.withColumn("mn", _nbr_min())
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"),
                F.least(F.col("u"), F.col("mn")).alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges (big→small); connect u and its ≤-neighbors to the min."""
    b = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    bm = b.withColumn("m", _nbr_min())
    # both output families — (v, m) per edge and (u, m) per node — come
    # from the SAME windowed frame: duplicate ROWS with one explode
    # instead of duplicating the PLAN with a union (two branches would
    # re-exchange and re-sort the full edge set — ReuseExchange does
    # not fire across them, probe-verified on the executed plan).  The
    # (u, m) copy repeats per edge of u where a groupBy emitted it
    # once; the trailing distinct dedupes everything in its one
    # exchange either way.
    return (
        bm.select(F.explode(F.array(
            F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
            F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
        )).alias("__s"))
        .select("__s.u", "__s.v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_out: str = "id",
    comp_out: str = "component",
    max_iter: int = 30,
) -> DataFrame:
    """Component label (= min node id in the component) for every node that
    appears in ``edges``.  Returns (id_out, comp_out); roots label
    themselves.  Nodes with no edges don't appear (their component is
    trivially themselves — callers that need singleton rows can union them
    in, see ``dedup_by_components`` which doesn't need to).

    Ids may be any orderable type (long, string); they are never hashed or
    re-keyed, so labels are directly joinable back to the source table.
    """
    # Per-round checkpoint release (labelprop/pagerank discipline — r12
    # audit): the old `e.unpersist()` was a silent NO-OP for block
    # release (DataFrame.unpersist talks to the cache manager, which
    # knows nothing of localCheckpoint RDDs), so every call pinned
    # rounds+1 truncated-lineage edge frames for the session's lifetime
    # (measured: 4 blocks leaked by one tiny call).  Release goes
    # through getPersistentRDDs id-diffs instead.  The INITIAL
    # checkpoint stays pinned: it is the first scan of `edges`, so a
    # caller cache with lazy registration lands inside its diff and
    # must not be swept — ≤2 pinned frames per call (initial + final).
    sc = edges.sparkSession.sparkContext


    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = None
    prev_ids: set = set()    # round 0 = the initial checkpoint: kept
    # try/except (r13 ADVICE): an exception mid-loop must not leave the
    # current round's blocks pinned for the session — nothing is
    # returned on the error path, so the tracked round ids (never the
    # initial shield checkpoint) are releasable.
    try:
        for _ in range(max_iter):
            snap = pinned_ids(sc)
            # convergence fingerprint rides the checkpoint action as an
            # observe metric — one job per round instead of checkpoint +
            # a second agg job over the checkpointed blocks (r13).
            # Sum in decimal(38,0): a long sum of 64-bit hashes
            # overflows under ANSI mode.
            obs = Observation()
            e2 = (
                _small_star(_large_star(e))
                .observe(
                    obs,
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.xxhash64("u", "v").cast("decimal(38,0)"))
                    .alias("h"),
                )
                .localCheckpoint(eager=True)
            )
            new_ids = pinned_ids(sc) - snap
            # e2 is materialized — the previous round's blocks (never the
            # initial scan's) had their last read and can go
            release(sc, prev_ids)
            prev_ids = new_ids
            e = e2
            m = obs.get
            fp = (m["n"], m["h"])
            if fp == prev:
                break
            prev = fp
        else:
            print(
                f"WARNING connected_components: no convergence in "
                f"{max_iter} rounds — labels may be incomplete on "
                f"adversarial graphs; raise max_iter.",
                file=sys.stderr,
            )
    except BaseException:
        release(sc, prev_ids)
        raise
    # At the fixed point every component is a star rooted at its min node:
    # a child's only neighbor is the root (min(child, root) = root), the
    # root's neighbors are all larger (min = itself).
    return (
        _symmetrize(e)
        .groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(F.col("u").alias(id_out), F.least("u", "mn").alias(comp_out))
    )


def component_size_report(
    pairs: DataFrame,
    n_total: int | None = None,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Duplication datasheet from a near-dup pair list → one row per
    cluster size: (cluster_size, n_clusters, n_members, n_removed).

    ``n_removed`` = members − clusters is what dedup will delete at
    that size; summing the column gives the corpus's duplicate count,
    and with ``n_total`` (corpus row count) a singleton row
    (cluster_size=1) is added so the report partitions the whole
    corpus — the "how duplicated is my crawl" number that belongs in
    every release datasheet next to ``report.corpus_report``.
    Cost: the connected-components rounds plus one tiny two-level
    aggregation (cluster sizes, then size-of-size)."""
    comp = connected_components(pairs, src, dst)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    rep = (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .withColumn("n_members",
                    F.col("cluster_size") * F.col("n_clusters"))
        .withColumn("n_removed", F.col("n_members") - F.col("n_clusters"))
    )
    if n_total is not None:
        spark = pairs.sparkSession
        n_in_clusters = comp.count()
        singles = int(n_total) - n_in_clusters
        if singles < 0:
            raise ValueError(
                f"n_total={n_total} is smaller than the {n_in_clusters} "
                f"ids that appear in pairs")
        one = spark.createDataFrame(
            [(1, singles, singles, 0)],
            "cluster_size bigint, n_clusters bigint, n_members bigint, "
            "n_removed bigint")
        rep = one.unionByName(rep.select(
            F.col("cluster_size").cast("bigint"),
            F.col("n_clusters").cast("bigint"),
            F.col("n_members").cast("bigint"),
            F.col("n_removed").cast("bigint")))
    return rep.orderBy("cluster_size")


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    keep_by: str | None = None,
) -> DataFrame:
    """Keep ONE member of every near-dup cluster; rows never named in
    ``pairs`` survive untouched.

    Representative policy: with ``keep_by=None`` the min-id member wins
    (cheapest — the component root IS the representative, no second
    pass).  With ``keep_by=<column>`` the cluster member with the
    HIGHEST value of that column wins (ties → lowest id) — the policy a
    production dedup actually wants: near-dup clusters usually contain
    one clean page and N boilerplate-damaged copies, and min-id keeps
    whichever crawled first.  Pass a quality score
    (quality_classifier.classifier_scores, gopher_signals-derived, or
    ccnet log-prob) to keep the best copy instead.

    Scale shape with ``keep_by``: components (id → component) joins the
    (id, keep_by) projection — never text — and one max_by aggregation
    per component elects the winner; the final anti-join key is ids
    only."""
    comp = connected_components(pairs, src, dst)
    if keep_by is None:
        losers = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
        return df.join(losers, id_col, "left_anti")
    scored = comp.join(
        df.select(F.col(id_col).alias("id"), F.col(keep_by).alias("__q")),
        "id",
    )
    # argmax __q, ties → min id, without negating either column: a
    # max_by(id, struct(__q, -id)) one-liner only works for ids/scores
    # whose type supports unary minus, and both ids (strings) and scores
    # (timestamps — "latest crawl wins") legitimately don't.  Both aggs
    # are partial-agg friendly and sized by component count, not corpus.
    best_q = scored.groupBy("component").agg(F.max("__q").alias("__mq"))
    winners = (
        scored.join(best_q, "component")
        # null-safe: an all-null-score cluster still elects its min id
        .filter(F.col("__q").eqNullSafe(F.col("__mq")))
        .groupBy("component")
        .agg(F.min("id").alias("__keep"))
    )
    losers = (
        scored.join(winners, "component")
        .filter(F.col("id") != F.col("__keep"))
        .select(F.col("id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")
