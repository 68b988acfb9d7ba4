"""End-to-end training-corpus preparation pipeline (scale extension).

Composes the round-6 training-data operator stack into the canonical
"raw crawl → training sequences" flow a 100 TB pipeline actually runs:

    raw documents
      → URL blocklist + URL dedup (opt)  (url_filter — suffix equi-join,
                                          canonical-key window; FIRST,
                                          the RefinedWeb §3.1 order)
      → Gopher + C4 quality gate         (quality_filters — narrow)
      → PII redaction                    (pii — narrow)
      → exact dedup                      (dedup.exact_dedup — hash keys)
      → C4 3-sentence span dedup         (span_dedup — hash-key shuffles)
      → MinHash near-dedup + components  (dedup + components — bucketed)
      → ExactSubstr passage dedup (opt)  (substring_dedup mode='fast' —
                                          rolling-hash windows, after
                                          fuzzy dedup per RefinedWeb)
      → source mixing (optional)         (mixing — narrow sample)
      → sequence packing                 (packing — one bucket exchange)

    Exact dedup runs BEFORE the span/near stages deliberately: it is the
    cheapest reduction (one 32-byte-key exchange) and every row it drops
    is a row the expensive span explode and MinHash signature passes
    never see.  (It also keeps span dedup's owner election from being
    the thing that happens to collapse full duplicates — span dedup
    would empty the later copy anyway, but at explode cost.)

Stage boundaries are ``localCheckpoint`` cuts: each wide stage's output
materializes once and the next stage plans against the checkpointed
blocks, so (a) the multi-use dedup inputs don't recompute, and (b) the
per-stage rows/wall telemetry in :class:`StageMetrics` measures the
stage, not its upstream lineage.  Telemetry rides the D10 machinery —
``sm.observe`` (CollectMetrics, zero extra jobs) + ``materialized()``
wall clocks — so the run produces the same per-stage table as the
V1/V2 pipelines.

Every stage is the already-gated operator — this module adds
composition, not new semantics; its test asserts the glue (stage
ordering, count monotonicity, report shape), not operator internals.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators import pii as pii_mod
from llmxmapreduce_spark.operators import quality_filters
from llmxmapreduce_spark.operators.dedup import (exact_dedup,
                                                 minhash_dedup_pairs)
from llmxmapreduce_spark.operators.components import dedup_by_components
from llmxmapreduce_spark.operators.packing import pack_sequences
from llmxmapreduce_spark.operators.span_dedup import span_dedup
from llmxmapreduce_spark.operators.stage_metrics import StageMetrics
from llmxmapreduce_spark.retention import pinned_ids, release


@dataclass
class CorpusPrepConfig:
    url_blocklist: DataFrame | None = None  # one lowercase domain per row
                                     # ('domain'): RefinedWeb §3.1 URL
                                     # blocklist, applied FIRST — a real
                                     # crawl filters URLs before standing
                                     # up any text-level work
    url_dedup: bool = False          # C4 one-page-per-canonical-URL rule
                                     # (min id wins); requires url_col
    url_col: str = "url"
    quality: bool = True
    quality_rules: tuple = ("gopher", "c4")  # rulesets quality_filter runs
                                     # (presets.py narrows this: pure-C4
                                     # prep must not apply Gopher gates)
    quality_thresholds: dict = field(default_factory=dict)
    c4_line_filter: bool = False     # True: C4 §2.2 line REMOVAL feeds
                                     # forward (c4_clean_text becomes the
                                     # text column) instead of acting only
                                     # as a whole-document gate
    redact: bool = True
    lm: tuple | None = None          # (bigrams, unigrams, log10_oov) from
                                     # lm_filter.train_bigram_lm — a CCNet
                                     # perplexity gate after the rulesets
    max_perplexity: float | None = None
    span: int = 3                    # 0 disables span dedup
    substring_n: int | None = None   # ExactSubstr window (Lee et al.
                                     # 2107.06499; paper uses 50): mask
                                     # every ≥n-word passage repeated
                                     # across the surviving corpus, after
                                     # near-dedup (RefinedWeb runs exact-
                                     # substring AFTER fuzzy dedup);
                                     # mode='fast' rolling-hash scan
    neardup: bool = True             # False skips the MinHash fuzzy pass
                                     # entirely (C4-style preps predate
                                     # fuzzy dedup; exact dedup still runs)
    neardup_threshold: float = 0.7
    neardup_verify: str = "estimate"
    neardup_fast: bool = False       # True: xxhash64 minhash family
                                     # (dedup.py's documented production
                                     # variant — whole-stage codegen, no
                                     # per-shingle md5 string churn; r13:
                                     # the md5 family cost ~2× on the
                                     # signature pass).  Default stays the
                                     # oracle-portable md5 family so
                                     # existing callers' survivor sets
                                     # don't drift across versions (both
                                     # are valid min-wise families, but
                                     # borderline-Jaccard survivors can
                                     # differ — ±1 doc at sf0.1; r13
                                     # ADVICE): production/bench call
                                     # sites opt in explicitly.
    badwords: DataFrame | None = None  # one word/phrase per row ('word'):
                                       # C4 §2.2 bad-word page gate inside
                                       # the quality stage
    benchmark: DataFrame | None = None  # eval docs (doc_id, text):
                                     # GPT-3 App. C decontamination stage
                                     # (fast poly-hash twin) after near-dedup
    decon_n: int = 13                # gram length for the decon stage
    mix_weights: dict | None = None  # source → weight; None = keep all
    mix_target: int | None = None
    mix_upsample: bool = False       # allow epochs > 1 per stratum
    max_tokens: int = 2048
    split_oversized: bool = True     # split > max_tokens docs (C1 chunker)
                                     # instead of emitting truncated bins
    shuffle_output: bool = False     # assign each packed sequence a
                                     # deterministic 0..n-1 `train_pos`
                                     # (ordering.deterministic_shuffle,
                                     # keyed on seq_id ⊕ seed): the
                                     # reproducible epoch order trainers
                                     # consume, without orderBy(rand())'s
                                     # retry nondeterminism or a global
                                     # window
    seed: int = 42


def _cutter(sm: StageMetrics | None):
    """Stage-boundary checkpoint with supersede-release (r12 audit): the
    pipeline's ``d`` chain is strictly linear, so once cut N
    materializes, cut N−1's blocks (and any internal checkpoints the
    stage made between the two cuts, e.g. minhash pair frames) have had
    their last read — released immediately instead of pinning one
    corpus-sized truncated-lineage frame PER STAGE for the session.
    The FIRST cut's ids are kept: it is the first materialization of
    the caller's plan, so lazily-registering caller caches land in its
    diff and must not be swept (labelprop r11 review class).  Net: ≤2
    pinned corpus frames per call (first + latest) instead of ~9."""
    state: dict = {"shield": None, "window": set(), "mark": set(),
                   "sc": None}

    def cut(name: str, df: DataFrame) -> DataFrame:
        if sm is not None:
            df = sm.observe(name, df)
        sc = df.sparkSession.sparkContext
        state["sc"] = sc
        df = df.localCheckpoint(eager=True)
        now = pinned_ids(sc)
        if state["shield"] is None:
            # everything pinned by the end of cut 1 — the cut itself,
            # any stage-internal checkpoints, and every pre-existing or
            # lazily-registered caller/session cache — is off-limits
            state["shield"] = now
        else:
            # the previous inter-cut window (cut N−1's frame + stage
            # N−1 internals) had its last read when THIS cut
            # materialized
            release(sc, state["window"] - state["shield"])
            state["window"] = now - state["mark"]
        state["mark"] = pinned_ids(sc)
        if sm is not None:
            sm.materialized(name)
        return df

    def abort() -> None:
        """Error-path release (r13 ADVICE): call from the pipeline's
        except handler when an exception interrupts the stage chain.
        The current inter-cut window plus anything registered since the
        last mark is this call's unreturned residue — release it (minus
        the shield) so an error doesn't pin corpus-sized frames for the
        rest of the session, which is exactly the leak this cutter
        exists to prevent and exactly when memory pressure is highest.
        Before the first cut nothing is tracked, so nothing is swept."""
        sc = state["sc"]
        if sc is None or state["shield"] is None:
            return
        release(sc, (state["window"] | (pinned_ids(sc) - state["mark"]))
                - state["shield"])

    cut.abort = abort
    return cut


def run_corpus_prep(
    docs: DataFrame,
    cfg: CorpusPrepConfig | None = None,
    stage_metrics: StageMetrics | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ packed training sequences (seq_id, n_docs, total_tokens,
    truncated, text).  Pass a :class:`StageMetrics` to get the per-stage
    rows/wall report after the action runs.

    Composition of the two halves — :func:`prep_documents` (doc-level
    curation through mixing) then :func:`pack_corpus` (packing tail);
    callers that need to act at the document level between them (e.g.
    dataset_build's leakage-safe holdout split AFTER global dedup but
    BEFORE per-side packing) call the halves directly."""
    cfg = cfg or CorpusPrepConfig()
    d = prep_documents(docs, cfg, stage_metrics, id_col, text_col)
    return pack_corpus(d, cfg, stage_metrics, id_col, text_col)


def prep_documents(
    docs: DataFrame,
    cfg: CorpusPrepConfig | None = None,
    stage_metrics: StageMetrics | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document-level half of the pipeline: URL curation → quality/PII →
    dedup ladder → decontamination → mixing.  Returns curated DOCUMENT
    rows (same schema as the input, plus ``epoch`` when upsampling)."""
    cfg = cfg or CorpusPrepConfig()
    sm = stage_metrics
    cut = _cutter(sm)
    # try/except (r13 ADVICE): release the cutter's tracked
    # windows on the error path instead of pinning them for the
    # session (see _cutter.abort).
    try:

        d = docs
        if cfg.url_blocklist is not None or cfg.url_dedup:
            # crawl-side URL curation FIRST (RefinedWeb §3.1 stage order):
            # every row dropped here is a row no text-level stage ever scans
            # — at crawl scale this is the difference between filtering a
            # URL string and filtering a fetched page
            from llmxmapreduce_spark.operators.url_filter import (
                dedup_urls, filter_blocked_domains)

            if cfg.url_col not in d.columns:
                raise TypeError(
                    f"corpus_prep: url curation configured but column "
                    f"{cfg.url_col!r} is absent from the input")
            if cfg.url_blocklist is not None:
                d = filter_blocked_domains(d, cfg.url_blocklist,
                                           url_col=cfg.url_col)
            if cfg.url_dedup:
                d = dedup_urls(d, url_col=cfg.url_col, id_col=id_col)
            d = cut("url_curation", d)
        if cfg.quality:
            d = quality_filters.quality_filter(
                d, text_col, rules=cfg.quality_rules,
                keep_clean_text=cfg.c4_line_filter,
                **cfg.quality_thresholds)
        if cfg.badwords is not None:
            from llmxmapreduce_spark.operators.url_filter import badwords_filter

            d = badwords_filter(d, cfg.badwords, text_col, id_col)
        if (cfg.lm is None) != (cfg.max_perplexity is None):
            # half-configured gate must fail fast, not silently skip — the
            # same orphaned-threshold contract as quality_filter
            raise TypeError(
                "corpus_prep: lm and max_perplexity must be set together "
                f"(got lm={'set' if cfg.lm is not None else None!r}, "
                f"max_perplexity={cfg.max_perplexity!r})")
        if cfg.lm is not None:
            # CCNet-style LM gate: runs after the cheap rule filters so the
            # bigram explode + broadcast LM join only sees their survivors
            from llmxmapreduce_spark.operators.lm_filter import perplexity_filter

            d = perplexity_filter(d, cfg.lm, cfg.max_perplexity,
                                  text_col, id_col)
        if cfg.redact:
            d = pii_mod.redact_pii(d, text_col)
        d = cut("quality_redact", d)

        d = exact_dedup(d, text_col=text_col, id_col=id_col)
        d = cut("exact_dedup", d)

        if cfg.span:
            spans = span_dedup(d, text_col, id_col, cfg.span)
            d = (
                d.drop(text_col)
                .join(spans.filter(F.length("clean_text") > 0)
                      .select(id_col, F.col("clean_text").alias(text_col)),
                      id_col)
            )
            d = cut("span_dedup", d)

        if cfg.neardup:
            pairs = minhash_dedup_pairs(
                d, text_col=text_col, id_col=id_col,
                threshold=cfg.neardup_threshold, verify=cfg.neardup_verify,
                fast=cfg.neardup_fast)
            d = dedup_by_components(d, pairs, id_col=id_col)
            d = cut("near_dedup", d)

        if cfg.substring_n:
            # ExactSubstr (Lee et al. 2107.06499) AFTER near-dedup — the
            # RefinedWeb order: fuzzy dedup removes whole near-duplicate
            # documents first, so the window scan only chases the repeated
            # PASSAGES (boilerplate, quotes, licenses) that survive it
            from llmxmapreduce_spark.operators.substring_dedup import (
                substring_dedup)

            subs = substring_dedup(d, n=cfg.substring_n, id_col=id_col,
                                   text_col=text_col, mode="fast")
            d = (
                d.drop(text_col)
                .join(subs.filter(F.length("clean_text") > 0)
                      .select(id_col, F.col("clean_text").alias(text_col)),
                      id_col)
            )
            d = cut("substring_dedup", d)

        if cfg.benchmark is not None:
            # GPT-3 App. C decontamination, AFTER dedup so the gram scan only
            # sees surviving docs; the fast poly-hash twin (one mapInPandas
            # scan, bench grams in the closure) — id-only anti-join back
            from llmxmapreduce_spark.operators.decontamination import (
                contamination_flags_fast)

            flagged = contamination_flags_fast(
                d, cfg.benchmark, n=cfg.decon_n,
                id_col=id_col, text_col=text_col).select(id_col)
            d = d.join(flagged, id_col, "left_anti")
            d = cut("decontaminate", d)

        if cfg.mix_weights:
            from llmxmapreduce_spark.operators.mixing import mix_sources

            # mix_target=None is derived INSIDE mix_sources from the stratum-
            # count aggregate it already runs — no extra full-scan count job
            d = mix_sources(d, cfg.mix_weights, cfg.mix_target,
                            allow_upsample=cfg.mix_upsample, seed=cfg.seed)
            d = cut("mixing", d)
        return d
    except BaseException:
        cut.abort()
        raise


def pack_corpus(
    d: DataFrame,
    cfg: CorpusPrepConfig | None = None,
    stage_metrics: StageMetrics | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Packing half: oversized-doc splitting → bucketed FFD packing →
    optional deterministic output ordering.  Input is curated document
    rows (:func:`prep_documents` output or any (id, text[, epoch])
    frame)."""
    cfg = cfg or CorpusPrepConfig()
    sm = stage_metrics

    pack_src = d.select(id_col, text_col)
    if "epoch" in d.columns:
        # epoch upsampling repeats doc ids; packing requires unique keys
        # (pack_assignments raises on dups) — derive a composite uid
        pack_src = d.select(
            F.xxhash64(F.col(id_col), F.col("epoch")).alias(id_col),
            text_col)
    if cfg.split_oversized:
        # reuse the V1 token-budget chunker (C1) at word granularity so a
        # > max_tokens document becomes several packable parts instead of
        # a dedicated truncated bin the trainer then has to cut anyway
        from llmxmapreduce_spark.operators.chunker import chunk_documents, ws_len
        from llmxmapreduce_spark.operators.text_stats import ws_tokens

        n_words = F.size(ws_tokens(F.col(text_col)))
        fits = pack_src.filter(n_words <= cfg.max_tokens)
        # normalize ALL whitespace to single spaces before the space-
        # separated chunk split: a newline-separated word run would
        # otherwise ride through as one giant "split" that the chunker's
        # space-guard DROPS (silent token loss — found by review repro);
        # parts are therefore whitespace-normalized, which packing's
        # word-join output format already is
        # (?U): Unicode \s — an NBSP-joined word run must also collapse,
        # or the Python-side ws_len (unicode split) disagrees with the
        # space-separated chunk split and the run can vanish in the
        # chunker's space-guard (second review round)
        over = pack_src.filter(n_words > cfg.max_tokens).withColumn(
            text_col, F.regexp_replace(F.col(text_col), r"(?U)\s+", " "))
        parts = chunk_documents(
            over,
            id_col=id_col, text_col=text_col,
            budget_col=F.lit(cfg.max_tokens), length_fn=ws_len,
            separator=" ",
        ).select(
            F.xxhash64(F.col(id_col), F.col("chunk_id")).alias(id_col),
            F.col("text").alias(text_col))
        pack_src = fits.unionByName(parts)
    packed = pack_sequences(pack_src, cfg.max_tokens,
                            id_col=id_col, text_col=text_col)
    if sm is not None:
        packed = sm.observe("packing", packed)
    if cfg.shuffle_output:
        from llmxmapreduce_spark.operators.ordering import (
            deterministic_shuffle)

        # pin the pack output first: position assignment runs a counts
        # job plus the final consumption, and without the cut the whole
        # upstream pipeline would recompute for each ("packing" is
        # already observed above — plain checkpoint, not cut())
        packed = packed.localCheckpoint(eager=True)
        if sm is not None:
            sm.materialized("packing")
        packed = deterministic_shuffle(packed, id_col="seq_id",
                                       seed=cfg.seed, pos_col="train_pos")
        if sm is not None:
            packed = sm.observe("ordering", packed)
    return packed
