"""The generic batched-LLM operator (SURVEY.md §2.10b) — the single pattern
behind every L1-L27 "LLM scalar".

``llm_stage`` is a ``mapInPandas`` transformation: per Arrow batch it formats
prompts from row fields, calls the client (one client per partition — the
Spark analog of the reference's per-model request pool,
request/wrapper.py:12-67), parses replies, and emits the payload plus the
error-sentinel bookkeeping columns ``llm_ok/llm_error/llm_attempts``
(async_d/node/node.py:243-272, decorator.py:9-18).  Failed rows flow on and
can be quarantined with :func:`dead_letter_split` instead of killing the job.

Scale notes: Arrow-batched (never row-at-a-time Python), no driver collect,
and the stage's parallelism = its input partitioning, so LLM concurrency is
tuned by ``repartition(n)`` before the stage.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from llmxmapreduce_spark.llm.client import LLMClient, RetryPolicy, call_with_retry

LLM_COLS = [
    T.StructField("llm_ok", T.BooleanType(), False),
    T.StructField("llm_error", T.StringType(), True),
    T.StructField("llm_attempts", T.IntegerType(), False),
]


class LLMMetrics:
    """D10/D12 call + token accounting via Spark accumulators (the engine
    analog of the reference's token_counter.py:7-37 / pipeline_analyser).

    Character counts stand in for tokens (÷4 ≈ the reference's estimate);
    accumulators aggregate across all executors and are readable on the
    driver after each action.
    """

    def __init__(self, spark):
        sc = spark.sparkContext
        self.calls = sc.accumulator(0)
        self.failures = sc.accumulator(0)
        self.prompt_chars = sc.accumulator(0)
        self.reply_chars = sc.accumulator(0)

    def snapshot(self) -> dict:
        return {
            "calls": self.calls.value,
            "failures": self.failures.value,
            "prompt_chars": self.prompt_chars.value,
            "reply_chars": self.reply_chars.value,
            "est_prompt_tokens": self.prompt_chars.value // 4,
            "est_reply_tokens": self.reply_chars.value // 4,
        }


def llm_stage(
    df: DataFrame,
    build_prompt: Callable[[dict[str, Any]], str],
    parse: Callable[[str], dict[str, Any]],
    client_factory: Callable[[], LLMClient],
    payload_fields: list[T.StructField],
    keep_cols: list[str],
    retry: RetryPolicy | None = None,
    metrics: LLMMetrics | None = None,
) -> DataFrame:
    """Run one LLM stage over ``df``.

    - ``build_prompt(row_dict) -> str`` — prompt template over row fields.
    - ``parse(reply) -> dict`` — validated payload; raising marks the row
      ``llm_ok=false`` (parse-and-retry is the reference's schema system,
      process_str.py:8-29).
    - ``payload_fields`` — schema of what ``parse`` returns.
    - ``keep_cols`` — input columns carried through (ids, ordering keys).

    When ``retry`` is omitted, the policy comes from the client's own
    ``retry_policy`` (the per-provider preset on OpenAICompatClient),
    falling back to the test default.  The probe instantiates one client on
    the driver; per-partition clients are created inside ``run``.
    """
    if retry is None:
        retry = getattr(client_factory(), "retry_policy", None) or RetryPolicy()
    keep_fields = [df.schema[c] for c in keep_cols]
    out_schema = T.StructType(keep_fields + payload_fields + LLM_COLS)
    payload_names = [f.name for f in payload_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            out_rows = []
            for row in pdf.to_dict("records"):
                prompt = build_prompt(row)
                reply, err, attempts = call_with_retry(client, prompt, retry)
                if metrics is not None:
                    metrics.calls.add(1)
                    metrics.prompt_chars.add(len(prompt))
                    if reply is None:
                        metrics.failures.add(1)
                    else:
                        metrics.reply_chars.add(len(reply))
                payload: dict[str, Any] = dict.fromkeys(payload_names)
                ok = reply is not None
                if ok:
                    try:
                        parsed = parse(reply)
                        payload.update({k: parsed.get(k) for k in payload_names})
                    except Exception as e:  # noqa: BLE001 - sentinel semantics
                        ok, err = False, f"ParseError: {type(e).__name__}: {e}"
                out_rows.append(
                    {**{c: row[c] for c in keep_cols}, **payload,
                     "llm_ok": ok, "llm_error": err, "llm_attempts": attempts}
                )
            yield pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)


def dead_letter_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ok_rows, failed_rows) — D8 quarantine instead of crash."""
    return df.filter("llm_ok"), df.filter("NOT llm_ok")


# ---------------------------------------------------------------------------
# Prompt-hash result cache (SURVEY.md §4 "Caching/reuse" extension).
#
# The reference caches nothing except the V3 crawl resume
# (LLMxMapReduce_V3/src/mcp_server/llm_search_mcp_server.py:1043-1060, which
# skips already-crawled URLs on restart).  At 100 TB the same idea applied to
# LLM calls is the single biggest cost lever a re-run has: identical prompts
# (re-digests of unchanged papers, repeated eval rubrics, incremental corpus
# refreshes) should hit a persisted result table instead of the model.
# ---------------------------------------------------------------------------

PROMPT_HASH_COL = "__prompt_hash"

# above this on-disk size, llm_stage_cached prunes the cache read with a
# semi-join on the batch's hashes instead of deduping the whole cache
PRUNE_CACHE_READ_BYTES = 256 * 1024 * 1024


def _cache_bytes(spark, cache_dir: str) -> int:
    """Total on-disk bytes under ``cache_dir`` (0 if absent) — the cheap
    FS-level signal for the prune-vs-full-dedupe read strategy."""
    jvm = spark._jvm
    base = jvm.org.apache.hadoop.fs.Path(cache_dir)
    fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(base):
        return 0
    return int(fs.getContentSummary(base).getLength())


def with_prompt_hash(
    df: DataFrame,
    build_prompt: Callable[[dict[str, Any]], str],
    version: str = "",
    hash_col: str = PROMPT_HASH_COL,
) -> DataFrame:
    """Pure pre-pass: append the md5 of the prompt each row WOULD send
    (no LLM traffic).  ``version`` is salted into the hash — bump it when
    the prompt template or the parser changes semantics, and the whole
    cache invalidates without a directory wipe.

    The prompt is built twice for cache misses (here and inside the LLM
    stage) rather than carried as a column: prompts are the widest thing
    in these pipelines, and shipping a 16-byte hash through the cache
    join instead of the full text is the difference between a bounded
    shuffle and re-shuffling the corpus.  ``build_prompt`` must therefore
    be deterministic — the same contract that makes caching sound at all.
    """
    if hash_col in df.columns:
        raise ValueError(
            f"with_prompt_hash: input already has a {hash_col!r} column")
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(hash_col, T.StringType(), False)])
    salt = version.encode() + b"\x00"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            pdf = pdf.copy()
            pdf[hash_col] = [
                hashlib.md5(salt + build_prompt(row).encode()).hexdigest()
                for row in pdf.to_dict("records")
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def read_prompt_cache(spark, cache_dir: str,
                      payload_fields: list[T.StructField],
                      hash_col: str = PROMPT_HASH_COL,
                      relevant: DataFrame | None = None) -> DataFrame | None:
    """The deduplicated cache table ``(hash_col, *payload, llm_attempts)``,
    or None before the first write.  Existence goes through the Hadoop
    FileSystem API (the streaming-admission idiom, streaming/ingest.py) —
    never a parse of one Spark version's error text.  Appends may have
    written the same hash twice (two concurrent runs, duplicate prompts in
    one batch at different times); one row per hash is picked by a total
    order over the payload struct, so every reader resolves ties the same
    way.

    ``relevant`` (a frame containing ``hash_col``) prunes the cache with a
    left-semi join BEFORE the dedupe shuffle: an incremental batch over a
    big accumulated cache then shuffles ~batch-size rows, not the whole
    cache — the difference between O(batch) and O(cache) per run at
    100 TB.  AQE broadcasts the batch side while it is small."""
    jvm = spark._jvm
    base = jvm.org.apache.hadoop.fs.Path(cache_dir)
    fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
    # a pre-created EMPTY directory is a normal cold start (mkdtemp,
    # mkdir -p deploy scripts) — treat it like absence, or the parquet
    # read dies with UNABLE_TO_INFER_SCHEMA
    if not fs.exists(base) or not fs.listFiles(base, True).hasNext():
        return None
    raw = spark.read.parquet(cache_dir)
    if relevant is not None:
        raw = raw.join(relevant.select(hash_col), hash_col, "left_semi")
    names = [f.name for f in payload_fields] + ["llm_attempts"]
    picked = (
        raw.groupBy(hash_col)
        .agg(F.max(F.struct(*[F.col(n) for n in names])).alias("__p"))
    )
    return picked.select(hash_col, *[F.col(f"__p.{n}").alias(n) for n in names])


def llm_stage_cached(
    df: DataFrame,
    build_prompt: Callable[[dict[str, Any]], str],
    parse: Callable[[str], dict[str, Any]],
    client_factory: Callable[[], LLMClient],
    payload_fields: list[T.StructField],
    keep_cols: list[str],
    cache_dir: str,
    retry: RetryPolicy | None = None,
    metrics: LLMMetrics | None = None,
    version: str = "",
) -> DataFrame:
    """:func:`llm_stage` behind a persisted prompt-hash result cache.

    Same output schema and row set as ``llm_stage`` (keep_cols + payload +
    the D8 sentinel columns), with three engine changes:

    - rows whose prompt hash is already in ``cache_dir`` never reach the
      model: their payload (and original ``llm_attempts``) replays from
      the cache with ``llm_ok=true``;
    - cache misses are deduplicated by prompt BEFORE calling — N rows
      sharing one prompt cost ONE call even on a cold cache, then fan
      back out over the 16-byte hash join;
    - successful fresh results are appended to ``cache_dir`` (parquet;
      appends are new files, so concurrent runs never corrupt — dup
      hashes are resolved deterministically at read).

    Failed rows (``llm_ok=false``) are returned with the usual sentinel
    but NOT cached, so the next run retries them — the D8/D13 contract.

    The fresh-results frame is eagerly localCheckpointed (the LLM calls
    must run exactly once for the cache write AND the returned rows);
    like the fused v2 stages, that one bounded frame stays pinned until
    the caller's own retention boundary releases it.

    Scale: the cache join is an equi-join on a 16-byte hash (broadcast
    while the cache is small, shuffle-on-hash after), the append is an
    executor-side parquet write, and nothing collects to the driver.
    """
    spark = df.sparkSession
    payload_names = [f.name for f in payload_fields]
    # Materialize the hash pre-pass ONCE: the hit join, the miss anti-
    # join, and the fan-out join all read `hashed` — lazy, each would
    # re-run the whole upstream plan (a chunker feeding an LLM stage is
    # typical), which measured as ~2× pipeline overhead on the V1 board
    # fixture.  The checkpoint is one input-pass frame, the same class as
    # the pipeline's own stage boundaries; it stays pinned until the
    # caller's retention boundary (like the fresh-results frame below).
    hashed = with_prompt_hash(df, build_prompt, version) \
        .localCheckpoint(eager=True)
    # Prune the cache read only once the cache is big enough that its
    # dedupe shuffle dominates (the semi-join costs an extra join — a
    # net loss while the cache is batch-sized, a requirement once it has
    # accumulated for months).
    prune = _cache_bytes(spark, cache_dir) > PRUNE_CACHE_READ_BYTES
    cache = read_prompt_cache(spark, cache_dir, payload_fields,
                              relevant=hashed if prune else None)

    if cache is None:
        hits = None
        misses = hashed
    else:
        # aliased sides: an input column may legitimately share a name
        # with a payload column (V1's map stage keeps chunk `text` and
        # emits payload `text`) — keep_cols resolve against the input,
        # payload against the cache
        hits = hashed.alias("__in").join(cache.alias("__c"),
                                         PROMPT_HASH_COL).select(
            *[F.col(f"__in.{c}") for c in keep_cols],
            *[F.col(f"__c.{n}").alias(n) for n in payload_names],
            F.lit(True).alias("llm_ok"),
            F.lit(None).cast("string").alias("llm_error"),
            F.col("__c.llm_attempts").alias("llm_attempts"),
        )
        misses = hashed.join(cache.select(PROMPT_HASH_COL),
                             PROMPT_HASH_COL, "left_anti")

    # one call per DISTINCT prompt; any representative row works because
    # the hash pins the prompt text (build_prompt sees identical inputs)
    from llmxmapreduce_spark.retention import pinned_ids, release

    snap = pinned_ids(spark.sparkContext)
    fresh_payload = llm_stage(
        misses.dropDuplicates([PROMPT_HASH_COL]),
        build_prompt, parse, client_factory, payload_fields,
        [PROMPT_HASH_COL], retry, metrics,
    ).localCheckpoint(eager=True)
    ckpt_ids = pinned_ids(spark.sparkContext) - snap

    # fully-warm fast path: with zero misses the checkpoint is empty —
    # skip the append job and the fan-out join, release the empty frame,
    # and serve everything from the cache side (measured: these no-op
    # jobs are most of a warm re-run's wall with a fast model)
    if hits is not None and fresh_payload.isEmpty():
        release(spark.sparkContext, ckpt_ids)
        return hits

    fresh_payload.filter("llm_ok").select(
        PROMPT_HASH_COL, *payload_names, "llm_attempts"
    ).write.mode("append").parquet(cache_dir)

    fresh = misses.select(*keep_cols, PROMPT_HASH_COL).join(
        fresh_payload, PROMPT_HASH_COL
    ).select(*keep_cols, *payload_names, "llm_ok", "llm_error",
             "llm_attempts")
    return fresh if hits is None else hits.unionByName(fresh)


# ---------------------------------------------------------------------------
# Deterministic-filter pushdown below the LLM stage (SURVEY.md §4's other
# optional rule: "push deterministic filters below LLM ops if a user
# composes them out of order").
#
# Catalyst cannot do this itself: mapInPandas is an opaque barrier, so a
# filter written AFTER the stage — even one touching only pass-through
# columns — executes after every LLM call has been paid.  The deferred
# builder below knows the stage's keep-column contract, so it can classify
# each top-level conjunct of a user filter and run the deterministic
# input-column ones BEFORE the model.
# ---------------------------------------------------------------------------


def _conjuncts(jexpr):
    """Top-level AND conjuncts of an analyzed Catalyst expression."""
    if jexpr.getClass().getSimpleName() == "And":
        return _conjuncts(jexpr.left()) + _conjuncts(jexpr.right())
    return [jexpr]


def _classify_predicate(spark, predicate: str,
                        input_fields: list[T.StructField],
                        output_fields: list[T.StructField],
                        ) -> tuple[list[str], list[str]]:
    """Split ``predicate`` into (pre_stage, post_stage) conjunct SQL lists.

    A conjunct runs pre-stage iff it is deterministic and references only
    input columns; everything else runs post-stage (and must reference
    only output columns — anything less is a user error worth a clear
    message, not a late AnalysisException).  Analysis happens on an empty
    frame carrying the union of both schemas WITH their real types (a
    bare ``llm_ok`` predicate must typecheck as boolean), so resolution
    and the ``deterministic`` bit come from Catalyst itself, not a
    re-parser.
    """
    merged: list[T.StructField] = []
    seen: set[str] = set()
    for f in list(input_fields) + list(output_fields):
        if f.name not in seen:
            seen.add(f.name)
            merged.append(f)
    probe = spark.createDataFrame([], T.StructType(merged))
    cond = probe.filter(predicate)._jdf.queryExecution().analyzed().condition()

    pre, post = [], []
    in_set = {f.name for f in input_fields}
    out_set = {f.name for f in output_fields}
    for cj in _conjuncts(cond):
        refs = cj.references().toSeq()
        names = {refs.apply(i).name() for i in range(refs.size())}
        sql = cj.sql()
        if cj.deterministic() and names <= in_set:
            pre.append(sql)
        elif names <= out_set:
            post.append(sql)
        else:
            missing = sorted(names - out_set)
            raise ValueError(
                f"filter conjunct {sql} references column(s) {missing} that "
                "are neither pre-stage input columns nor post-stage output "
                "columns (keep_cols + payload + llm_* sentinels)")
    return pre, post


class DeferredLLMStage:
    """An :func:`llm_stage` (or :func:`llm_stage_cached`) whose build is
    deferred so filters composed "after" it can be cost-placed.

    ::

        out = (DeferredLLMStage(df, build_prompt, parse, factory,
                                PAYLOAD, ["doc_id", "lang"])
               .filter("lang = 'en'")            # runs BEFORE the model
               .filter("llm_ok AND score > 3")   # runs after
               .df())

    Classification is per top-level AND conjunct: deterministic conjuncts
    over input columns are pushed below the stage (each skipped row is a
    skipped LLM call); conjuncts touching the payload or the ``llm_*``
    sentinels stay above; non-deterministic conjuncts are never reordered
    (a sampling filter must see the stage the user wrote it against).
    ``cache_dir`` routes the build through the prompt-hash cache.
    """

    def __init__(self, df: DataFrame, build_prompt, parse, client_factory,
                 payload_fields: list[T.StructField], keep_cols: list[str],
                 retry: RetryPolicy | None = None,
                 metrics: LLMMetrics | None = None,
                 cache_dir: str | None = None, version: str = ""):
        self._df = df
        self._args = (build_prompt, parse, client_factory, payload_fields,
                      keep_cols, retry, metrics, cache_dir, version)
        self._pre: list[str] = []
        self._post: list[str] = []

    def filter(self, predicate) -> "DeferredLLMStage":
        """Add a filter; each top-level conjunct lands on the cheap side."""
        payload_fields, keep_cols = self._args[3], self._args[4]
        output_fields = ([self._df.schema[c] for c in keep_cols]
                         + list(payload_fields) + list(LLM_COLS))
        pre, post = _classify_predicate(
            self._df.sparkSession, str(predicate),
            list(self._df.schema.fields), output_fields)
        self._pre += pre
        self._post += post
        return self

    def df(self) -> DataFrame:
        (build_prompt, parse, client_factory, payload_fields, keep_cols,
         retry, metrics, cache_dir, version) = self._args
        src = self._df
        for p in self._pre:
            src = src.filter(p)
        if cache_dir is not None:
            out = llm_stage_cached(src, build_prompt, parse, client_factory,
                                   payload_fields, keep_cols, cache_dir,
                                   retry, metrics, version)
        else:
            out = llm_stage(src, build_prompt, parse, client_factory,
                            payload_fields, keep_cols, retry, metrics)
        for p in self._post:
            out = out.filter(p)
        return out


def compact_prompt_cache(spark, cache_dir: str,
                         payload_fields: list[T.StructField],
                         hash_col: str = PROMPT_HASH_COL) -> int:
    """Rewrite ``cache_dir`` with one row per prompt hash, returning the
    compacted row count.  Long-lived caches accumulate duplicate hashes
    (concurrent runs, repeated cold batches) and small append files; the
    read path tolerates both (deterministic struct-max dedupe), but each
    read then re-pays the dedupe over dead rows — compaction makes the
    steady state O(distinct prompts) again.

    Write-then-swap, never in-place: the deduped table lands in a
    ``…__compact`` sibling, the old directory is renamed aside, the
    sibling renamed in, and the old data deleted last — a reader
    sees either the old files or the new, not a half-written mix.
    (Hadoop rename is atomic per directory on HDFS/local FS; on object
    stores with non-atomic rename, run compaction in a maintenance
    window like any parquet table rewrite.)  Not safe concurrently with
    WRITERS — appends landing between the read and the swap are lost;
    schedule it like the reference schedules its crawl-state cleanup.
    """
    table = read_prompt_cache(spark, cache_dir, payload_fields, hash_col)
    if table is None:
        return 0
    tmp = cache_dir.rstrip("/") + "__compact"
    old = cache_dir.rstrip("/") + "__old"
    table.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p_cache = jvm.org.apache.hadoop.fs.Path(cache_dir)
    p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
    p_old = jvm.org.apache.hadoop.fs.Path(old)
    fs = p_cache.getFileSystem(conf)
    if fs.exists(p_old):
        fs.delete(p_old, True)
    if not fs.rename(p_cache, p_old):
        raise IOError(f"compact_prompt_cache: could not move {cache_dir} "
                      f"aside to {old}")
    if not fs.rename(p_tmp, p_cache):
        # roll back so the cache is never left missing
        fs.rename(p_old, p_cache)
        raise IOError(f"compact_prompt_cache: could not install {tmp} "
                      f"as {cache_dir} (original restored)")
    fs.delete(p_old, True)
    return n
