"""Data mixing: stratified sampling to a target source composition
(scale extension).

Training corpora are MIXTURES — "x% web, y% code, z% books", with some
sources repeated for multiple epochs (The Pile, LLaMA, GPT-3 all publish
such tables).  This module turns a corpus with a strata column into that
mixture natively:

- :func:`stratified_sample` — per-stratum Bernoulli sampling
  (``df.sampleBy``: narrow, one pass, deterministic per seed, no
  shuffle);
- :func:`mix_sources` — the planner on top: given target WEIGHTS and a
  row budget, derive per-stratum fractions from per-stratum counts (one
  aggregate), optionally UPSAMPLING a stratum past 1 epoch by exploding
  whole copies + a fractional remainder — the "books ×2 epochs" case.
- :func:`mix_sources_by_budget` — the same planner over a TOKEN (or any
  per-row cost) budget: the published mixture tables are token-weighted,
  and by-rows sampling over-represents short-doc sources by tokens.

100 TB framing: the only job before sampling is one groupBy(strata)
count (partial-agg, tiny result); sampling itself is a narrow map with
a per-row RNG draw — no shuffle, no skew sensitivity, trivially
pipelined into the quality/dedup ingest pass.  Upsampled copies are
produced by ``explode(sequence(...))`` at the EXECUTOR, so no driver
loop and no repeated scans per epoch.

Determinism: ``sampleBy``/``rand`` are seeded per partition — results
are reproducible for a fixed (data, partitioning, seed), the same
contract as ``sampling.py``'s score-weighted sampler.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample.  ``fractions`` maps stratum value →
    keep probability in [0, 1]; strata absent from the dict are DROPPED
    (explicit composition, not pass-through)."""
    bad = {k: v for k, v in fractions.items() if not 0.0 <= v <= 1.0}
    if bad:
        raise ValueError(f"stratified_sample: fractions outside [0,1]: {bad}")
    return df.sampleBy(strata_col, fractions, seed=seed)


def sample_n_per_stratum(
    df: DataFrame,
    strata_col: str,
    n: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """EXACTLY min(n, |stratum|) rows per stratum, chosen by a portable
    seeded hash rank — the fixed-size companion to
    :func:`stratified_sample`: fractional Bernoulli gives binomial-noise
    counts and a partitioning-dependent draw, while eval slices /
    per-source audit samples need exact sizes and a draw that is a pure
    function of (row id, seed) — stable across partitioning, engines,
    and reruns (values-grade oracle `stratified_sample_n`).

    Rank = md5(id # seed) prefix as a 60-bit int (the repo's portable
    cross-engine hash, cf. c6_hash_batches), ties broken by id; top-n
    per stratum via a rank-limited window.  Spark's WindowGroupLimit
    pushes the limit below the shuffle (partial top-n map-side), so a
    hot stratum ships at most n·partitions rows, not its whole
    membership."""
    if n <= 0:
        raise ValueError("sample_n_per_stratum: n must be positive")
    from pyspark.sql import Window

    rank = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.col(id_col).cast("string"),
                              F.lit(str(seed)))), 1, 15),
        16, 10,
    ).cast("decimal(38,0)")
    w = Window.partitionBy(strata_col).orderBy(
        rank.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample_n(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    by: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, distributed: exactly
    min(n, |stratum|) rows per stratum with inclusion probability
    proportional to ``weight_col`` — the Efraimidis-Spirakis A-ES
    scheme (IPL 2006): each row draws u ~ U(0,1) and the top-n by
    u^(1/w) IS a weighted sample without replacement.

    This is the quality-aware companion of :func:`sample_n_per_stratum`
    (uniform): "keep the best-looking 100k docs per source, sampled in
    proportion to their quality score, reproducibly."

    Portability (values-grade): u derives from md5(id#seed) (a pure
    function of the row — stable across partitioning, engines, reruns);
    the ranking key uses the monotone transform log10(u)/w quantized to
    DECIMAL(28,8) (the ccnet libm convention: a one-ulp log10
    difference is ~1e-16, far below the 1e-8 quantum), ties broken by
    id.  Selection is a rank-limited window per stratum —
    WindowGroupLimit keeps a hot stratum's shuffle at n·partitions
    rows.  Rows with null/non-positive weight never qualify (P(pick) is
    proportional to w; w ≤ 0 means "never") — they are filtered, not
    errored, so a quality score of 0 composes naturally."""
    if n <= 0:
        raise ValueError("weighted_sample_n: n must be positive")
    from pyspark.sql import Window

    u_int = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.col(id_col).cast("string"),
                              F.lit(str(seed)))), 1, 15),
        16, 10,
    ).cast("decimal(38,0)")
    # u in (0, 1]: (h + 1) / 2^60 — never 0, so log10 is finite.
    # cast-THEN-add mirrors the SQL twin exactly (the two orders can
    # differ by an ulp near 2^60; harmless under the 1e-8 quantum, but
    # identical expressions cost nothing)
    u = (u_int.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    key = F.round(F.log10(u) / F.col(weight_col).cast("double"), 8) \
        .cast("decimal(28,8)")
    src = df.filter(F.col(weight_col).isNotNull()
                    & (F.col(weight_col) > 0)) \
        .withColumn("__k", key)
    part = [by] if by else []
    w = Window.partitionBy(*part).orderBy(
        F.col("__k").desc(), F.col(id_col).asc())
    return (src.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__rn", "__k"))


def weighted_sample_sql(table: str, n: int, weight_col: str,
                        id_col: str = "doc_id", by: str = "source",
                        seed: int = 42,
                        cols: str | None = None) -> str:
    """DuckDB twin of :func:`weighted_sample_n` (grouped form) — the
    identical md5 draw, quantized-log key, and rank cut."""
    cols = cols or f"{by}, {id_col}"
    h = (f"CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR) || '#' || "
         f"'{seed}'), 1, 15)) AS UBIGINT)")
    key = (f"CAST(round(log10((CAST({h} AS DOUBLE) + 1) / {float(1 << 60)!r})"
           f" / CAST({weight_col} AS DOUBLE), 8) AS DECIMAL(28,8))")
    return f"""
        SELECT {cols} FROM (
            SELECT {cols},
                   row_number() OVER (PARTITION BY {by}
                       ORDER BY {key} DESC, {id_col} ASC) AS rn
            FROM {table}
            WHERE {weight_col} IS NOT NULL AND {weight_col} > 0)
        WHERE rn <= {n}
    """


def temperature_weights(counts: dict, alpha: float = 0.7) -> dict:
    """Multinomial temperature-sampling weights: w_s ∝ n_s^alpha,
    normalized — the GPT-3 / Llama / XLM-R data-mixing recipe
    (alpha=1 proportional to size, alpha=0 uniform over sources,
    alpha≈0.7 the usual low-resource upweighting).  Pure driver
    arithmetic; feed the result to :func:`mixture_plan`."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    present = {s: n for s, n in counts.items() if n and n > 0}
    if not present:
        raise ValueError("temperature_weights: no non-empty sources")
    raw = {s: float(n) ** alpha for s, n in present.items()}
    tot = sum(raw.values())
    return {s: w / tot for s, w in raw.items()}


def mixture_plan(
    counts: dict,
    weights: dict,
    target_rows: int,
    allow_upsample: bool = False,
) -> dict:
    """Pure planning arithmetic (driver-side, testable without Spark):
    stratum → effective sampling RATE (may exceed 1.0 when upsampling).

    rate_s = target_rows × w_s / n_s with weights normalized over the
    strata present in ``counts``.  Without ``allow_upsample`` rates are
    capped at 1.0 (the stratum contributes everything it has — the
    composition then under-delivers that stratum rather than silently
    repeating data)."""
    present = {s: w for s, w in weights.items() if counts.get(s)}
    if not present:
        raise ValueError("mixture_plan: no overlap between weights and data")
    wsum = sum(present.values())
    plan = {}
    for s, w in present.items():
        rate = target_rows * (w / wsum) / counts[s]
        plan[s] = rate if allow_upsample else min(rate, 1.0)
    return plan


def mix_sources(
    df: DataFrame,
    weights: dict,
    target_rows: int | None,
    strata_col: str = "source",
    allow_upsample: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Sample ``df`` to approximately ``target_rows`` rows with the given
    per-stratum composition.  With ``allow_upsample`` a stratum whose
    rate exceeds 1.0 is repeated ``floor(rate)`` whole times (epochs)
    plus a ``rate - floor(rate)`` fractional sample — every copy of a row
    carries an ``epoch`` column (0-based) so downstream shuffles can
    still distinguish them.

    ``target_rows=None`` defaults to HALF the input rows, derived from
    the stratum-count aggregate this function already runs — no extra
    count job (callers like corpus_prep used to pay a full-scan
    ``df.count()`` for the same default)."""
    counts = {r[0]: r[1] for r in
              df.groupBy(strata_col).count().collect()}
    if target_rows is None:
        target_rows = sum(counts.values()) // 2
    plan = mixture_plan(counts, weights, target_rows, allow_upsample)
    return _apply_plan(df, plan, strata_col, allow_upsample, seed)


def mix_sources_by_budget(
    df: DataFrame,
    weights: dict,
    target_budget: int | None,
    budget_col: str = "n_tokens",
    strata_col: str = "source",
    allow_upsample: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Token-budget mixing: the published composition tables (GPT-3
    Table 2.2, LLaMA Table 1, The Pile) weight sources by TOKENS, not
    documents — a books stratum at 10 % by rows is far more than 10 %
    by tokens.  Same planner as :func:`mix_sources` but the per-stratum
    measure is ``sum(budget_col)`` and ``target_budget`` is in budget
    units (``None`` → half the corpus budget).

    Sampling rows uniformly at rate r within a stratum yields the
    stratum budget share r·B_s in EXPECTATION; the realized share
    concentrates at corpus scale (sub-gamma tails in the per-doc
    budget), which is the same guarantee row-budget mixing gives for
    row counts.  One aggregate job (partial+final sum, tiny result) —
    plan shape identical to mix_sources."""
    sums = {r[0]: int(r[1]) for r in
            df.groupBy(strata_col).agg(F.sum(budget_col)).collect()
            if r[1] is not None}
    if target_budget is None:
        target_budget = sum(sums.values()) // 2
    plan = mixture_plan(sums, weights, target_budget, allow_upsample)
    return _apply_plan(df, plan, strata_col, allow_upsample, seed)


def _apply_plan(df: DataFrame, plan: dict, strata_col: str,
                allow_upsample: bool, seed: int) -> DataFrame:
    if not allow_upsample:
        # rates are already capped at 1.0 — a full-epoch stratum keeps
        # everything (NOT rate − floor(rate), which would zero it out)
        return stratified_sample(df, strata_col, plan, seed) \
            .withColumn("epoch", F.lit(0))

    frac_part = {s: r - math.floor(r) for s, r in plan.items()}
    sampled = stratified_sample(df, strata_col, frac_part, seed) \
        .withColumn("epoch", F.lit(0))
    if all(r < 1.0 for r in plan.values()):
        return sampled

    # whole epochs: explode k copies executor-side (k = floor(rate) ≥ 1),
    # epochs numbered 1..k so epoch 0 is always the fractional draw
    epochs_map = F.create_map(*[
        x for s, r in plan.items() if math.floor(r) >= 1
        for x in (F.lit(s), F.lit(int(math.floor(r))))
    ])
    whole = (
        df.withColumn("__k", F.try_element_at(epochs_map, F.col(strata_col)))
        .filter(F.col("__k").isNotNull())
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("__k"))))
        .drop("__k")
    )
    return sampled.unionByName(whole)
