"""Exact set-similarity join (AllPairs / PPJoin prefix filtering —
Bayardo et al. WWW'07, Xiao et al. WWW'08): ALL pairs of documents
whose token-set Jaccard meets a threshold, with no false negatives and
no all-pairs comparison.

Where this sits in the dedup ladder: MinHash+LSH (dedup.py) is the
APPROXIMATE corpus-scale path — recall < 1 by construction, tunable via
bands.  This operator is the EXACT path for the workloads that need a
guarantee (entity resolution, eval-set leak auditing, legal-grade
dedup): every qualifying pair is returned, priced by candidate count
rather than n².

The algorithm, Spark-first:

1. **Global token order** = (document frequency asc, token asc) — rare
   tokens first.  No global rank table is materialized: the (count,
   token) PAIR is itself a total order, so ordering within each doc
   needs only a token-keyed count join (partial-aggregated) and a
   per-doc window — never an unpartitioned window.
2. **Prefix**: a doc with n distinct tokens keeps its first
   ``n - ceil(t·n) + 1`` tokens in that order.  Completeness proof
   (the reason no pair is lost): let w be the smallest-ordered common
   token of a qualifying pair (x, y).  J(x,y) ≥ t with the length
   filter |y| ≥ t·|x| gives overlap o ≥ ceil(t·|x|).  If w were
   outside x's prefix, x would hold ≥ prefix-length non-common tokens
   below w, leaving ≤ ceil(t·|x|) − 1 slots for common tokens — less
   than o.  Contradiction; w is in BOTH prefixes, so the prefix×prefix
   equi-join on the token sees every qualifying pair.
3. **Candidates**: prefix-exploded self-equi-join on the token with
   the symmetric length filter (t·|x| ≤ |y| ∧ t·|y| ≤ |x|) — a hash
   join on the token, never a cartesian.
4. **Verify**: exact ``array_intersect`` on the candidate pairs only.

Scale notes: the shuffles are (a) token counts (partial-agg), (b) one
per-doc window Exchange on id, (c) the prefix join on the token key.
Stopword-class tokens order LAST (max df), so they rarely enter short
prefixes — the design reason prefix filtering beats naive token
joins on Zipfian text.  Token arrays travel only to verify candidate
pairs, mirroring ``dedup.jaccard_verify``.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _threshold_ratio(threshold) -> tuple[int, int]:
    """Exact rational (p, q) for a similarity threshold.

    A float is interpreted as its DECIMAL literal via
    ``Fraction(str(t))`` — 0.8 means 4/5 exactly, NOT the binary double
    3602879701896397/2^52 — so every boundary compare in this module
    cross-multiplies in int64 with zero rounding steps (round-9 review:
    ``F.ceil(t * n)`` on a non-dyadic float threshold can round up past
    an exact integer boundary, shortening the prefix by one and
    silently breaking the no-false-negatives guarantee).  ``Fraction``
    or ``(p, q)`` tuples pass through for callers that want a
    non-decimal rational.  q is capped at 10^6 so p·n stays far below
    2^63 for any real token-set size."""
    if isinstance(threshold, tuple):
        frac = Fraction(*threshold)
    elif isinstance(threshold, Fraction):
        frac = threshold
    else:
        frac = Fraction(str(float(threshold)))
    p, q = frac.numerator, frac.denominator
    if not (0 < p <= q):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if q > 1_000_000:
        raise ValueError(
            f"threshold denominator {q} too large for exact int64 "
            f"cross-multiplication — pass a Fraction/(p, q) with "
            f"q <= 1e6 (float thresholds are read as decimal literals, "
            f"so any 6-decimal value is fine)")
    return p, q


def jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with token-set Jaccard ≥ ``threshold`` →
    (id_a, id_b, inter, n_a, n_b, jaccard), id_a < id_b.

    Input tokens are treated as a SET (``array_distinct`` applied);
    empty/null token arrays never pair.  ``threshold`` is read as an
    exact rational (see :func:`_threshold_ratio`: floats mean their
    decimal literal, Fraction/(p, q) pass through) and every boundary
    compare — prefix length, symmetric size filter, final verify — is
    integer cross-multiplication, so the no-false-negatives guarantee
    holds for EVERY threshold, not just dyadic ones.
    """
    p, q = _threshold_ratio(threshold)
    base = (
        df.select(F.col(id_col).alias("id"),
                  F.array_distinct(F.col(tokens_col)).alias("toks"))
        .filter(F.col("toks").isNotNull() & (F.size("toks") > 0))
    )
    tok = base.select("id", F.explode("toks").alias("tok"))
    cnt = tok.groupBy("tok").agg(F.count("*").alias("df_cnt"))
    ranked = tok.join(cnt, "tok")
    by_doc = Window.partitionBy("id")
    order = by_doc.orderBy("df_cnt", "tok")
    pos = (
        ranked.withColumn("pos", F.row_number().over(order))
        .withColumn("n", F.count("*").over(by_doc))
    )
    # pos <= n - ceil(p·n/q) + 1  ⟺  q·(n - pos + 1) >= p·n
    # (ceil(x) <= m ⟺ x <= m for integer m) — exact in int64
    prefix = pos.filter(
        F.lit(q) * (F.col("n") - F.col("pos") + 1) >= F.lit(p) * F.col("n"))
    l, r = prefix.alias("l"), prefix.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.tok") == F.col("r.tok"))
            & (F.col("l.id") < F.col("r.id"))
            & (F.lit(p) * F.col("l.n") <= F.lit(q) * F.col("r.n"))
            & (F.lit(p) * F.col("r.n") <= F.lit(q) * F.col("l.n")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    a = base.select(F.col("id").alias("id_a"), F.col("toks").alias("ta"),
                    F.size("toks").alias("n_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("toks").alias("tb"),
                    F.size("toks").alias("n_b"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.col("n_a") + F.col("n_b") - F.col("inter")
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn("inter", inter)
        .withColumn("n_union", union)
        .filter(F.lit(q) * F.col("inter") >= F.lit(p) * F.col("n_union"))
        .select("id_a", "id_b", "inter", "n_a", "n_b",
                (F.col("inter") / F.col("n_union")).alias("jaccard"))
    )


def containment_join(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    threshold: float = 0.8,
    outer_df: DataFrame | None = None,
) -> DataFrame:
    """Directional set containment: all ordered pairs where
    ``|inner ∩ outer| / |inner| ≥ threshold`` →
    (id_inner, id_outer, inter, n_inner, n_outer, containment).

    The asymmetric complement of :func:`jaccard_join`: a 40-token quote
    inside a 4 000-token page has Jaccard ≈ 0.01 but containment 1.0 —
    this is the subset/quote/eval-leak detection shape at set level
    (the n-gram ``decontamination`` module is the positional version).

    Prefix filtering adapts: only the INNER side prunes to its
    ``n − ceil(t·n) + 1`` rarest tokens (same completeness argument —
    a qualifying pair shares ≥ ceil(t·|inner|) tokens, more than fit
    outside the prefix); the outer side joins with ALL its tokens,
    because containment puts no upper bound on the outer size.  The
    only outer-side prune is ``|outer| ≥ ceil(t·|inner|)``.

    ``outer_df``: optional second table for the two-corpus audit
    (inner = benchmark/eval sets, outer = the training corpus);
    defaults to ``df`` itself with self-pairs excluded.

    ``threshold`` follows :func:`_threshold_ratio` (exact rational,
    integer cross-multiplied compares — no float boundary hazard).
    """
    p, q = _threshold_ratio(threshold)

    def prep(d: DataFrame) -> DataFrame:
        return (
            d.select(F.col(id_col).alias("id"),
                     F.array_distinct(F.col(tokens_col)).alias("toks"))
            .filter(F.col("toks").isNotNull() & (F.size("toks") > 0))
        )

    inner = prep(df)
    outer = prep(outer_df if outer_df is not None else df)
    itok = inner.select("id", F.explode("toks").alias("tok"))
    otok = outer.select("id", F.explode("toks").alias("tok"))
    # df-order from the OUTER (corpus) side — that's where frequency
    # lives; unseen inner tokens order first (df 0), which is safe:
    # ordering only affects WHICH prefix tokens are kept, not
    # completeness, since any total order works for the proof
    cnt = otok.groupBy("tok").agg(F.count("*").alias("df_cnt"))
    ranked = itok.join(cnt, "tok", "left") \
        .withColumn("df_cnt", F.coalesce("df_cnt", F.lit(0)))
    by_doc = Window.partitionBy("id")
    pos = (
        ranked.withColumn("pos",
                          F.row_number().over(by_doc.orderBy("df_cnt", "tok")))
        .withColumn("n", F.count("*").over(by_doc))
    )
    # same integer cross-multiplied prefix bound as jaccard_join
    prefix = pos.filter(
        F.lit(q) * (F.col("n") - F.col("pos") + 1) >= F.lit(p) * F.col("n"))
    osz = otok.withColumn("n", F.count("*").over(Window.partitionBy("id")))
    cand = (
        prefix.alias("l").join(
            osz.alias("r"),
            (F.col("l.tok") == F.col("r.tok"))
            & (F.col("l.id") != F.col("r.id"))
            # r.n >= ceil(p·l.n/q) ⟺ q·r.n >= p·l.n
            & (F.lit(q) * F.col("r.n") >= F.lit(p) * F.col("l.n")),
        )
        .select(F.col("l.id").alias("id_inner"),
                F.col("r.id").alias("id_outer"))
        .distinct()
    )
    a = inner.select(F.col("id").alias("id_inner"),
                     F.col("toks").alias("ta"),
                     F.size("toks").alias("n_inner"))
    b = outer.select(F.col("id").alias("id_outer"),
                     F.col("toks").alias("tb"),
                     F.size("toks").alias("n_outer"))
    inter = F.size(F.array_intersect("ta", "tb"))
    return (
        cand.join(a, "id_inner").join(b, "id_outer")
        .withColumn("inter", inter)
        .filter(F.lit(q) * F.col("inter") >= F.lit(p) * F.col("n_inner"))
        .select("id_inner", "id_outer", "inter", "n_inner", "n_outer",
                (F.col("inter") / F.col("n_inner")).alias("containment"))
    )


def jaccard_text_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    lowercase: bool = True,
) -> DataFrame:
    """Convenience wrapper: whitespace-tokenize ``text_col`` (the
    repo-wide ``\\s+`` split convention) and run :func:`jaccard_join`
    on the word sets."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    toks = F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")
    return jaccard_join(
        df.select(F.col(id_col), toks.alias("__toks")),
        id_col=id_col, tokens_col="__toks", threshold=threshold)
