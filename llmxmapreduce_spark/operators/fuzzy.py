"""Fuzzy string matching (entity resolution) without the cross join.

Dimension-table cleanup — supplier names, hostnames, product titles —
needs "which strings are within edit distance d of each other" without
an n² comparison.  The blocking here is the DELETION NEIGHBORHOOD
(the SymSpell scheme, public): every string emits the keys obtained by
deleting up to ``max_dist`` characters, and candidate pairs are those
sharing a key.  This blocking is EXHAUSTIVE for Levenshtein distance:
take an optimal alignment of a and b with ≤ d edits — deleting from
``a`` the characters the alignment substitutes/deletes (≤ d of them)
and from ``b`` the characters it substitutes/inserts (≤ d) leaves the
SAME string, so the two ≤d-deletion neighborhoods intersect.  The
exact ``levenshtein() <= d`` verify then removes the false candidates
(neighborhood overlap alone only bounds the distance by ~2d).

Plan shape: keys are built INSIDE Catalyst (transform over a character
index sequence → concat of substrings; d=2 adds the second deletion
level), exploded as (xxhash64(key), id) rows — 8-byte keys, never the
strings — one self equi-join on the key hash, distinct pair ids, then
ONE join back to the strings for the exact verify.

Scale honesty: a length-n string emits ~1 + n + n²/2 keys at d=2 —
this is a DIMENSION-table operator (10⁵-10⁷ names), not a corpus
operator; for document-scale near-dup use the MinHash/SimHash stack.
Oracle caveat: Spark's levenshtein counts CODEPOINTS and DuckDB's
counts BYTES — identical on ASCII; keep non-ASCII inputs off the
values oracle (test-pinned ASCII fixture).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _delete_one(s: Column) -> Column:
    """array of every 1-deletion variant of s (empty array for '')."""
    n = F.length(s)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.concat(F.substring(s, F.lit(1), i - 1),
                           s.substr(i + 1, n)),
    )


def deletion_keys(s: Column, max_dist: int) -> Column:
    """All strings reachable from ``s`` by 0..max_dist deletions,
    distinct.  max_dist ∈ {1, 2} (the useful range for names; key count
    grows as n^d)."""
    if max_dist not in (1, 2):
        raise ValueError("deletion_keys: max_dist must be 1 or 2")
    d1 = _delete_one(s)
    keys = F.concat(F.array(s), d1)
    if max_dist == 2:
        d2 = F.flatten(F.transform(d1, _delete_one))
        keys = F.concat(keys, d2)
    return F.array_distinct(keys)


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs (id_a < id_b) whose strings are within Levenshtein
    distance ``max_dist`` → (id_a, id_b, dist).  Null strings never
    match.  Exhaustive (deletion-neighborhood blocking + exact
    verify)."""
    s = df.select(F.col(id_col).alias("__id"),
                  F.col(col).alias("__s")).filter(F.col("__s").isNotNull())
    keyed = s.select(
        "__id",
        F.explode(deletion_keys(F.col("__s"), max_dist)).alias("__k"),
    ).select("__id", F.xxhash64("__k").alias("__kh"))
    a = keyed.alias("__a")
    b = keyed.alias("__b")
    cand = (a.join(b, (F.col("__a.__kh") == F.col("__b.__kh"))
                   & (F.col("__a.__id") < F.col("__b.__id")))
            .select(F.col("__a.__id").alias("id_a"),
                    F.col("__b.__id").alias("id_b"))
            .distinct())
    sa = s.select(F.col("__id").alias("id_a"), F.col("__s").alias("__sa"))
    sb = s.select(F.col("__id").alias("id_b"), F.col("__s").alias("__sb"))
    return (cand.join(sa, "id_a").join(sb, "id_b")
            .withColumn("dist", F.levenshtein("__sa", "__sb"))
            .filter(F.col("dist") <= F.lit(int(max_dist)))
            .select("id_a", "id_b", "dist"))


def fuzzy_dedup_names(
    df: DataFrame,
    col: str,
    id_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Canonicalize near-identical strings: rows whose ``col`` is within
    ``max_dist`` of a lower-id row adopt that row's value (one-hop
    min-id representative — NOT the transitive closure; for full
    variant clusters feed ``fuzzy_pairs`` into
    operators/components.connected_components like the near-dup
    stack does)."""
    pairs = fuzzy_pairs(df, col, id_col, max_dist=max_dist)
    rep = pairs.groupBy(F.col("id_b").alias(id_col)) \
        .agg(F.min("id_a").alias("__rep"))
    src = df.select(F.col(id_col), F.col(col).alias("__v"))
    return (df.join(rep, id_col, "left")
            .join(src.select(F.col(id_col).alias("__rep"),
                             F.col("__v").alias("__repv")),
                  "__rep", "left")
            .withColumn(col, F.coalesce("__repv", F.col(col)))
            .drop("__rep", "__repv"))
