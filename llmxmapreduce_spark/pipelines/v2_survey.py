"""V2 survey-generation pipeline (reference: LLMxMapReduce_V2, SURVEY.md §3.2).

Stages, each a DataFrame→DataFrame operator; the reference's gevent actor
DAG becomes a chain of Spark jobs with a bounded block-cycle loop
(hidden_pipeline.py:73-85 — ``digest → skeleton_refine → re-digest`` while
``block_cycle_count < block_count``):

  surveys ─ explode → papers ─ C7 group → digest groups
    ├─ C6 batch → L5 init outlines → L6 concat → outline          (encode)
    ├─ [block cycle ×block_count:
    │     L7 per-paper digest → J1 align → A3 merge → digests     (hidden)
    │     L9 feedback → conv block (T5/L10/L11/L12/T1) →
    │     L13 self-refine → refined outline → re-digest]
    └─ decode: L14 orchestra leaves → A6 bottom-up assembly →
          L15 polish → P12/J3 renumber → A7 → S5-shape            (decode)

Fused control plane: the convolution block, self-refine, and content
assembly are per-survey iterative LLM algorithms (the reference runs each
``forward()`` per survey object).  They are expressed as ONE
``applyInPandas`` stage per survey each — surveys are the scale axis
(thousands of independent groups on a cluster), per-survey state is tiny
(≤ result_num outlines), and intra-survey LLM calls can fan out over
``V2Config.llm_threads`` (the reference's per-node worker pool).  The
per-paper digest stage and per-section orchestra stage stay row-parallel
``mapInPandas`` — those are the big fan-outs.  This removes the per-layer /
per-depth global job barriers the staged form had: the whole refine loop is
one shuffle, and assembly is one shuffle, regardless of tree depth.

Determinism: every shuffle the reference does with ``random.shuffle`` is a
keyed-hash order here; T5 sampling uses a per-survey seeded RandomState; the
mock client is prompt-hash deterministic — two runs are byte-identical
(tests/test_v2_pipeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from llmxmapreduce_spark.functions import text as X
from llmxmapreduce_spark.llm.client import RetryPolicy, call_with_retry
from llmxmapreduce_spark.operators import digest_ops, grouping, sampling, skeleton
from llmxmapreduce_spark.operators.citations import cite_ratio as a7_cite_ratio
from llmxmapreduce_spark.operators.citations import references_block, renumber_citations
from llmxmapreduce_spark.operators.llm_op import llm_stage
from llmxmapreduce_spark.retention import pinned_ids, release


@dataclass
class V2Config:
    digest_batch: int = 3        # --digest_group_mode batch size (args.py:18)
    skeleton_batch: int = 3      # skeleton_group_size (args.py:19)
    block_count: int = 1         # --block_count (args.py:21; shipped script
                                 # scripts/pipeline_start.sh:13 uses 1)
    conv_layers: int = 2         # --conv_layer (args.py:24, default 6)
    receptive_field: int = 2     # kernel width (args.py:25, default 3)
    result_num: int = 4          # args.py:26, default 10
    top_k: int = 3               # args.py:27, default 6
    refine_rounds: int = 1       # refine_count (args.py:28, default 3)
    best_of: int = 2             # args.py:29, default 3
    seed: int = 42
    polish: bool = True
    figures: bool = False        # L16/J5 chart stage (chart_node)
    group_mode: str = "random"   # C7: 'random' (hash) | 'llm' (L4 + repair)
    llm_threads: int = 1         # intra-survey LLM fan-out inside the fused
                                 # stages (reference worker pool, node.py:48)
    full_prompts: bool = False   # use the reference's verbatim prompt texts
                                 # (prompts/prompts_{lang}.py) instead of the
                                 # condensed deterministic test templates
    prompt_lang: str = "en"      # reference PROMPT_LANGUAGE: 'en' | 'zh'
    shuffle_partitions: int | None = None
    # ^ control-plane shuffle sizing: the refine/assembly stages move a few
    # KB per survey, so shuffles should be sized to the survey count, not the
    # session default.  None = leave the session conf alone.  NOTE (r13
    # ADVICE): setting this ALSO disables spark.sql.adaptive.enabled
    # SESSION-WIDE for the duration of run_v2_survey (restored on exit) —
    # AQE re-planning is pure driver latency on KB-sized control-plane
    # shuffles.  The pipeline already assumes a single driver thread; any
    # concurrent query sharing the session during the run loses AQE too.
    fused_digest_feedback: bool = False
    # ^ run each block cycle's L7 digest → A3 merge → L9 feedback chain as
    # ONE applyInPandas stage (digest_feedback_fused — the SURVEY §4 LLM-
    # batch-coalescing strategy).  Output-identical to the staged path
    # (tests/test_v2_fused.py asserts exact equality); priced by the
    # v2_digest_feedback_{unfused,fused} bench rows.  Default off so the
    # golden-transcript hashes keep gating the staged operators too.
    fused_init_outlines: bool = False
    # ^ same strategy for the L5 single → L6 concat init chain
    # (init_outlines_fused); output-identical (tests/test_v2_fused.py).
    fused_conv_refine: bool = False
    # ^ same strategy for each cycle's convolution-block → self-refine
    # chain (conv_refine_fused): one survey-keyed exchange per cycle
    # instead of two — both stages already ran the SAME shared per-group
    # bodies, so fusion is byte-identical (tests/test_v2_fused.py).
    llm_cache_dir: str | None = None
    # ^ prompt-hash result cache root (llm_op.llm_stage_cached) for the
    # per-paper digest stage — the pipeline's dominant fan-out.  A re-run
    # over unchanged papers/outlines replays digests from
    # ``{dir}/digest`` instead of re-calling the model; cycle-2 prompts
    # embed the refined outline, so they miss (and populate) naturally.
    # run_v2_survey tracks the cached stage's two eager frames per call
    # and releases them once the cycle's digest checkpoint supersedes
    # them.  Default off; byte-identity with the uncached path is gated
    # by tests/test_v2_cache.py.


_STR = T.StringType()
_SCORES = T.ArrayType(T.DoubleType())
_BLOCK_SCORES = T.ArrayType(_SCORES)                     # per cycle: layer avgs
_REFINE_SCORES = T.ArrayType(T.ArrayType(_SCORES))       # per cycle/round: chain scores
_POOL_SIZES = T.ArrayType(T.ArrayType(T.IntegerType()))  # per cycle: pool sizes
#   pool-size trajectory [initial, after layer 0, ...]: pooling layers
#   contract the pool by the receptive field, prune layers clamp it to top_k
#   — the externally observable proof of the convolution_module.py:80-97
#   mode transition (and the per-stage telemetry the reference's monitor
#   prints, pipeline_analyser.py:64-124).


def _payload(*names: str) -> list[T.StructField]:
    return [T.StructField(n, _STR, True) for n in names]


def _parse_fenced(reply: str) -> dict:
    """parse_md_content semantics: fenced markdown payload or raise."""
    import re

    m = re.search(r"```markdown\n(.*?)\n```", reply, re.DOTALL)
    if not m:
        raise ValueError("MdNotFoundError: no fenced markdown block")
    out = m.group(1).strip()
    if "```" in out:
        raise ValueError("MdNotFoundError: nested fence")
    return {"md": out}


def _parse_fenced_with_suggestion(reply: str) -> dict:
    import re

    out = _parse_fenced(reply)
    s = re.search(r"```suggestion\n(.*?)\n```", reply, re.DOTALL)
    out["suggestion"] = s.group(1).strip() if s else None
    return out


def _parse_suggestion(reply: str) -> dict:
    import re

    m = re.search(r"```suggestion\n(.*?)\n```", reply, re.DOTALL)
    if not m:
        raise ValueError("MdNotFoundError: no suggestion block")
    return {"suggestion": m.group(1).strip()}


def _parse_score(reply: str) -> dict:
    """EvalOutlineNeuron parse: <SCORE>x</SCORE>, bounds-checked 0-10
    (neurons.py:212-244)."""
    import re

    m = re.search(r"<SCORE>([0-9.]+)</SCORE>", reply)
    if not m:
        raise ValueError("ScoreNotFoundError")
    score = float(m.group(1))
    if not 0 <= score <= 10:
        raise ValueError(f"score out of bounds: {score}")
    return {"score": score}


# ---------------------------------------------------------------------------
# prompt templates — shared by the row-parallel llm_stage operators and the
# fused per-survey stages, so both paths drive the mock identically.
#
# Two prompt modes (SURVEY.md §2 prompt parity):
# - condensed (default): the short deterministic templates below — the
#   test/mock contract every correctness golden hashes against.
# - full: the reference's verbatim texts (prompts/prompts_{lang}.py,
#   reference prompts_en.py:1-782), selected via
#   ``V2Config(full_prompts=True, prompt_lang=…)``.  ``_prompt_set``
#   resolves the template STRINGS on the driver; they ride into the stage
#   closures by value, so executors never consult driver-mutated globals.
# ---------------------------------------------------------------------------

_REF_PROMPT_NAMES = (
    "INIT_OUTLINE_PROMPT", "CONCAT_OUTLINE_PROMPT", "SINGLE_DIGEST_PROMPT",
    "DIGEST_BASE_PROMPT", "DIGEST_FREE_PROMPT", "OUTLINE_CONVOLUTION_PROMPT",
    "MODIFY_OUTLINE_PROMPT", "OUTLINE_ENTROPY_PROMPT", "ORCHESTRA_PROMPT",
    "SUMMARY_PROMPT", "POLISH_PROMPT",
)


def _prompt_set(cfg: "V2Config") -> dict[str, str] | None:
    """None for condensed mode; else name → verbatim reference template."""
    if not getattr(cfg, "full_prompts", False):
        return None
    from llmxmapreduce_spark import prompts as P

    return {n: P.template(n, cfg.prompt_lang) for n in _REF_PROMPT_NAMES}


def _modify_prompt(title: str, outline_md: str, content: str,
                   ps: dict[str, str] | None = None) -> str:
    if ps:
        # neurons.py:137-142 (bibkeys ride inside the digests/outline text)
        return ps["MODIFY_OUTLINE_PROMPT"].format(
            title=title, old_outline=outline_md, outlines=content)
    return (
        f"[MODIFY] Survey title: {title}\n"
        f"Outline:\n```markdown\n{outline_md}\n```\n"
        f"Suggestion:\n```suggestion\n{content}\n```\n"
        "Apply the suggestion; reply with a fenced ```markdown outline."
    )


def _eval_prompt(title: str, outline_md: str,
                 ps: dict[str, str] | None = None) -> str:
    if ps:
        return ps["OUTLINE_ENTROPY_PROMPT"].format(
            title=title, outline=outline_md)     # neurons.py:237-240
    return (
        f"[EVAL_OUTLINE] Survey title: {title}\n"
        f"Outline:\n```markdown\n{outline_md}\n```\n"
        "Score the information entropy 0-10 as <SCORE>x</SCORE>."
    )


def _kernel_prompt(title: str, joined: str,
                   ps: dict[str, str] | None = None,
                   outline_md: str = "") -> str:
    if ps:
        return ps["OUTLINE_CONVOLUTION_PROMPT"].format(
            title=title, outline=outline_md,
            suggestions=joined)                  # neurons.py:130-136
    return (
        f"[KERNEL] Survey title: {title}\n"
        f"Merge these suggestions into one:\n{joined}\n"
        "Reply with a ```suggestion block."
    )


def _refine_prompt(chain_id: int, rnd: int, title: str, outline_md: str,
                   ps: dict[str, str] | None = None,
                   eval_detail: str = "") -> str:
    if ps:
        # neurons.py:267-272: the free-refine suggestion prompt takes the
        # incumbent outline + its eval detail; chain/round diversity comes
        # from model sampling, not the prompt text.
        return ps["DIGEST_FREE_PROMPT"].format(
            title=title, outline=outline_md, eval_detail=eval_detail)
    return (
        f"[SELF_REFINE] chain {chain_id} round {rnd}\n"
        f"Survey title: {title}\n"
        f"Outline:\n```markdown\n{outline_md}\n```\n"
        "Reply with a ```suggestion block."
    )


def _summary_prompt(title: str, section: str, subcontents: str,
                    ps: dict[str, str] | None = None,
                    outline: str = "", digest: str = "") -> str:
    if ps:
        return ps["SUMMARY_PROMPT"].format(
            title=title, section_title=section, subcontents=subcontents,
            outline=outline, digest=digest)      # orchestra_module.py:70-78
    return (
        f"[SUMMARY] Survey title: {title}\n"
        f"Section title: {section}\n"
        f"Subsections:\n{subcontents[:3000]}\n"
        "Summarize into the parent section's lead prose."
    )


def _polish_prompt(section: str, content: str,
                   ps: dict[str, str] | None = None) -> str:
    if ps:
        return ps["POLISH_PROMPT"].format(content=content)  # orchestra:171
    return f"[POLISH] Section title: {section}\nDraft:\n{content}"


def _call(client, prompt: str, retry: RetryPolicy) -> str | None:
    reply, _err, _attempts = call_with_retry(client, prompt, retry)
    return reply


def _modify_eval_py(client, retry: RetryPolicy, title: str, outline_md: str,
                    sugg_id: str, content: str,
                    ps: dict[str, str] | None = None) -> dict | None:
    """One L11 modify → L12 eval chain for a candidate suggestion; None on
    any LLM failure or parse error (the candidate drops, matching the staged
    ``filter(llm_ok)`` semantics).  Shared by the conv block and
    self-refine fused stages."""
    reply = _call(client, _modify_prompt(title, outline_md, content, ps), retry)
    if reply is None:
        return None
    try:
        new_md = _parse_fenced(reply)["md"]
    except ValueError:
        return None
    reply2 = _call(client, _eval_prompt(title, new_md, ps), retry)
    if reply2 is None:
        return None
    try:
        score = _parse_score(reply2)["score"]
    except ValueError:
        return None
    return {"sugg_id": sugg_id, "content": content,
            "new_outline_md": new_md, "score": score,
            "eval_detail": reply2}


def _pmap(fn, items, threads: int):
    """Order-preserving map with bounded intra-survey concurrency (the fused
    analog of the reference's per-node worker pool, async_d node.py:48).

    With ``threads > 1`` the ONE client instance of the enclosing stage is
    called concurrently — the same contract as ``LLMClient.complete_batch``
    (a thread pool over ``self.complete``), so clients must keep
    ``complete()`` thread-safe, as the base class already requires."""
    items = list(items)
    if threads <= 1 or len(items) <= 1:
        return [fn(x) for x in items]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=threads) as ex:
        return list(ex.map(fn, items))


def _prune_py(rows: list[dict], k: int) -> list[dict]:
    """T1 ``_prune_top_k`` (convolution_module.py:207-229): score desc, ties
    broken by the deterministic sugg_id key (the engine's seeded stand-in
    for ``random.sample``) — same contract as operators/topk.prune_top_k."""
    return sorted(rows, key=lambda r: (-r["score"], r["sugg_id"]))[:k]


# ---------------------------------------------------------------------------
# encode: papers + grouping
# ---------------------------------------------------------------------------


def build_papers(surveys: DataFrame) -> DataFrame:
    """SURVEYS_INPUT → flat papers with P4/P5 enrichment and bibkey
    normalization (encode_pipeline.py:38-64 + digest.py:33-68)."""
    p = surveys.select(
        "survey_id", F.col("title").alias("survey_title"),
        F.posexplode("papers").alias("paper_pos", "p"),
    ).select(
        "survey_id", "survey_title", "paper_pos",
        F.coalesce(F.col("p.bibkey"), X.normalize_bibkey(F.col("p.title"))).alias("bibkey"),
        F.col("p.title").alias("title"), F.col("p.abstract").alias("abstract"),
        F.col("p.txt").alias("txt"), F.col("p.url").alias("url"),
        F.coalesce(F.col("p.txt_token"),
                   X.token_count_estimate(F.col("p.txt"))).alias("txt_token"),
    )
    # P2: drop surveys with zero papers happens naturally via the explode.
    return digest_ops.enrich_papers(p)


def group_papers(papers: DataFrame, cfg: V2Config,
                 client_factory=None, retry=None) -> DataFrame:
    """C7: 'random' = keyed-hash shuffle batches; 'llm' = L4 GroupNeuron
    proposal + regroup repair (group_module.py:29-133)."""
    if cfg.group_mode == "llm":
        if client_factory is None:
            raise ValueError("group_mode='llm' needs a client_factory")
        return grouping.llm_group_papers(papers, client_factory,
                                         cfg.digest_batch, retry,
                                         full_prompts=cfg.full_prompts,
                                         prompt_lang=cfg.prompt_lang)
    return grouping.hash_shuffled_batches(
        papers, "bibkey", cfg.digest_batch, seed=cfg.seed,
        partition_cols=["survey_id"], group_col="digest_id",
    )


# ---------------------------------------------------------------------------
# skeleton init: C6 → L5 → L6
# ---------------------------------------------------------------------------


_OUTLINE_CONCAT_SEPARATOR = "\n--------------------------\n"


def _init_outline_prompt(ps: dict | None, survey_title: str,
                         abstracts: str) -> str:
    """L5 per-batch outline prompt — shared by the staged
    :func:`init_outlines` and :func:`init_outlines_fused`."""
    if ps:
        return ps["INIT_OUTLINE_PROMPT"].format(
            title=survey_title, abstracts=abstracts)
    return (
        f"[INIT_OUTLINE] Survey title: {survey_title}\n"
        f"Propose a markdown outline (## sections with Digest "
        f"Construction/Analysis) for these papers.\nAbstracts:\n{abstracts}\n"
        "Reply with a fenced ```markdown block."
    )


def _concat_outline_prompt(ps: dict | None, survey_title: str,
                           outlines: str) -> str:
    """L6 per-survey concat prompt — shared by both init paths."""
    if ps:
        return ps["CONCAT_OUTLINE_PROMPT"].format(
            title=survey_title, outlines=outlines)
    return (
        f"[CONCAT_OUTLINE] Survey title: {survey_title}\n"
        f"Merge these partial outlines into one.\n{outlines}\n"
        "Reply with a fenced ```markdown block."
    )


def _init_per_batch(papers_grouped: DataFrame, cfg: V2Config) -> DataFrame:
    """C6 skeleton batching + per-batch abstract packing (pure Catalyst;
    shared by both init paths): → (survey_id, survey_title, batch_id,
    abstracts)."""
    batches = grouping.hash_shuffled_batches(
        papers_grouped.select("survey_id", "digest_id").distinct(),
        "digest_id", cfg.skeleton_batch, seed=cfg.seed + 1,
        partition_cols=["survey_id"], group_col="batch_id",
    )
    joined = papers_grouped.join(F.broadcast(batches), ["survey_id", "digest_id"])
    abstract_fmt = F.concat(
        F.lit("Bibkey: '"), F.col("bibkey"), F.lit("':\nAbstract:\n"),
        F.substring(F.col("abstract"), 1, 1500),
    )
    return (
        joined.withColumn("__a", F.struct(F.col("bibkey").alias("k"),
                                          abstract_fmt.alias("v")))
        .groupBy("survey_id", "survey_title", "batch_id")
        .agg(F.concat_ws(
            "\n---------------------\n",
            F.transform(F.array_sort(F.collect_list("__a")), lambda s: s["v"]),
        ).alias("abstracts"))
    )


def init_outlines(papers_grouped: DataFrame, client_factory, cfg: V2Config,
                  retry: RetryPolicy | None = None,
                  metrics=None) -> DataFrame:
    """→ (survey_id, survey_title, outline_md)."""
    per_batch = _init_per_batch(papers_grouped, cfg)
    ps = _prompt_set(cfg)
    single = llm_stage(
        per_batch,
        build_prompt=lambda r: _init_outline_prompt(
            ps, r["survey_title"], r["abstracts"]),
        parse=_parse_fenced,
        client_factory=client_factory,
        payload_fields=_payload("md"),
        keep_cols=["survey_id", "survey_title", "batch_id"],
        retry=retry,
        metrics=metrics,
    ).filter("llm_ok")
    per_survey = (
        single.withColumn("__o", F.struct(F.col("batch_id").alias("k"),
                                          F.col("md").alias("v")))
        .groupBy("survey_id", "survey_title")
        .agg(F.concat_ws(
            _OUTLINE_CONCAT_SEPARATOR,
            F.transform(
                F.array_sort(F.collect_list("__o")),
                lambda s: F.concat(F.lit("```markdown\n"), s["v"], F.lit("\n```")),
            ),
        ).alias("outlines"))
    )
    return llm_stage(
        per_survey,
        build_prompt=lambda r: _concat_outline_prompt(
            ps, r["survey_title"], r["outlines"]),
        parse=_parse_fenced,
        client_factory=client_factory,
        payload_fields=_payload("md"),
        keep_cols=["survey_id", "survey_title"],
        retry=retry,
        metrics=metrics,
    ).filter("llm_ok").select("survey_id", "survey_title",
                              F.col("md").alias("outline_md"))


_INIT_FUSED_SCHEMA = T.StructType([
    T.StructField("survey_id", _STR, False),
    T.StructField("survey_title", _STR, True),
    T.StructField("outline_md", _STR, True),
])


def init_outlines_fused(papers_grouped: DataFrame, client_factory,
                        cfg: V2Config, retry: RetryPolicy | None = None,
                        metrics=None) -> DataFrame:
    """The L5 single → L6 concat chain coalesced into ONE
    ``applyInPandas`` per survey (the second instance of the SURVEY §4
    LLM-batch-coalescing strategy; the first is
    :func:`digest_feedback_fused`).  Staged, the chain costs two
    mapInPandas stages with a per-survey aggregation (shuffle) between
    them; fused it is the per-batch Catalyst packing (shared code) then
    one shuffle and one Python pass running every batch's L5 call plus
    the survey's L6 concat with a single client.  Prompts come from the
    same builders as the staged path, so outputs are byte-identical
    (tests/test_v2_fused.py).  Opt-in via
    ``V2Config(fused_init_outlines=True)``."""
    if retry is None:
        retry = getattr(client_factory(), "retry_policy", None) or RetryPolicy()
    ps = _prompt_set(cfg)
    per_batch = _init_per_batch(papers_grouped, cfg)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        client = client_factory()
        title = pdf["survey_title"].iloc[0]
        survey_id = pdf["survey_id"].iloc[0]

        def _count(prompt, reply):
            if metrics is not None:
                metrics.calls.add(1)
                metrics.prompt_chars.add(len(prompt))
                if reply is None:
                    metrics.failures.add(1)
                else:
                    metrics.reply_chars.add(len(reply))

        mds: list[tuple[int, str]] = []
        for row in pdf.sort_values("batch_id").to_dict("records"):
            prompt = _init_outline_prompt(ps, title, row["abstracts"])
            reply, _err, _att = call_with_retry(client, prompt, retry)
            _count(prompt, reply)
            if reply is None:
                continue
            try:
                mds.append((int(row["batch_id"]), _parse_fenced(reply)["md"]))
            except Exception:   # parse error == staged llm_ok=false drop
                continue
        cols = [f.name for f in _INIT_FUSED_SCHEMA.fields]
        if not mds:             # staged: no llm_ok batches → survey absent
            return pd.DataFrame([], columns=cols)
        outlines = _OUTLINE_CONCAT_SEPARATOR.join(
            f"```markdown\n{md}\n```" for _b, md in sorted(mds))
        prompt = _concat_outline_prompt(ps, title, outlines)
        reply, _err, _att = call_with_retry(client, prompt, retry)
        _count(prompt, reply)
        if reply is None:
            return pd.DataFrame([], columns=cols)
        try:
            out_md = _parse_fenced(reply)["md"]
        except Exception:
            return pd.DataFrame([], columns=cols)
        return pd.DataFrame(
            [{"survey_id": survey_id, "survey_title": title,
              "outline_md": out_md}], columns=cols)

    return per_batch.groupBy("survey_id", "survey_title") \
        .applyInPandas(run, schema=_INIT_FUSED_SCHEMA)


# ---------------------------------------------------------------------------
# digests: L7 per paper → J1 align → A3 merge
# ---------------------------------------------------------------------------


def _digest_prompt(ps: dict | None, survey_title: str, bibkey: str,
                   content: str, outline_md: str, placeholder_md: str) -> str:
    """L7 per-paper digest prompt (digest_module.py:99-105) — ONE builder
    shared by the row-parallel :func:`make_digests` stage and the fused
    :func:`digest_feedback_fused` stage so the two paths are
    byte-identical by construction."""
    if ps:
        return ps["SINGLE_DIGEST_PROMPT"].format(
            survey_title=survey_title, paper_bibkey=bibkey,
            paper_content=(content or "").replace("#", ""),
            survey_outline=outline_md,
            outline_example=placeholder_md)
    return (
        f"[DIGEST] Paper bibkey: {bibkey}\n"
        f"Extract a digest aligned to this outline.\n"
        f"Paper:\n{(content or '')[:2000]}\n"
        f"Outline:\n```markdown\n{placeholder_md}\n```\n"
        "Reply with a fenced ```markdown digest matching the outline "
        "structure and a ```suggestion block."
    )


def _feedback_prompt(ps: dict | None, survey_title: str, outline_md: str,
                     digest_content: str) -> str:
    """L9 per-digest-group feedback prompt (neurons.py:55-67) — shared by
    :func:`feedback_suggestions` and :func:`digest_feedback_fused`."""
    if ps:
        return ps["DIGEST_BASE_PROMPT"].format(
            title=survey_title, outline=outline_md, digests=digest_content)
    return (
        f"[FEEDBACK] Survey title: {survey_title}\n"
        f"Outline:\n```markdown\n{outline_md}\n```\n"
        f"Digest group:\n{digest_content[:3000]}\n"
        "Reply with a ```suggestion block."
    )


def make_digests(papers_grouped: DataFrame, outlines: DataFrame, client_factory,
                 cfg: V2Config, retry: RetryPolicy | None = None,
                 metrics=None) -> tuple[DataFrame, DataFrame]:
    """→ (digests (survey_id, digest_id, pos, description), dead_letters).

    One row-parallel llm_stage over papers (the big fan-out), with the
    placeholder serialization and J1 structural alignment as scalar column
    expressions (skeleton.placeholder_udf / align_reason_udf) — no
    explode/regroup or full-outer join round-trips; the only shuffle is the
    A3 merge aggregation.  Runs once per block cycle (digest_node re-entry,
    hidden_pipeline.py:75).
    """
    o = outlines.select(
        "survey_id", "survey_title", "outline_md",
        skeleton.placeholder_udf("survey_title", "outline_md").alias("placeholder_md"),
    )
    per_paper = papers_grouped.drop("survey_title").join(F.broadcast(o), "survey_id")
    ps = _prompt_set(cfg)
    stage_kw = dict(
        build_prompt=lambda r: _digest_prompt(
            ps, r["survey_title"], r["bibkey"], r["content"],
            r["outline_md"], r["placeholder_md"]),
        parse=_parse_fenced_with_suggestion,
        client_factory=client_factory,
        payload_fields=_payload("md", "suggestion"),
        keep_cols=["survey_id", "survey_title", "outline_md", "digest_id", "bibkey"],
        retry=retry,
        metrics=metrics,
    )
    if cfg.llm_cache_dir is not None:
        import os as _os

        from llmxmapreduce_spark.operators.llm_op import llm_stage_cached

        raw = llm_stage_cached(
            per_paper, cache_dir=_os.path.join(cfg.llm_cache_dir, "digest"),
            **stage_kw)
    else:
        raw = llm_stage(per_paper, **stage_kw)
    # J1 per-paper structural correspondence; misaligned papers quarantine
    # like D8 dead letters (the reference raises + retries per paper).
    checked = raw.filter("llm_ok").withColumn(
        "align_reason",
        skeleton.align_reason_udf("survey_title", "outline_md", "md"),
    )
    good_nodes = (
        checked.filter("align_reason IS NULL")
        .select(
            "survey_id", "digest_id", "bibkey",
            F.explode(skeleton.parse_nodes_udf("survey_title", "md")).alias("node"),
        )
        .select("survey_id", "digest_id", "bibkey",
                F.col("node.pos").alias("pos"),
                F.col("node.description").alias("description"))
    )
    merged = digest_ops.merge_digest_descriptions(
        good_nodes.withColumn("bibkeys", F.array("bibkey")),
        id_cols=["survey_id", "digest_id"],
        digest_id_col="bibkey",
    )
    dead = raw.filter("NOT llm_ok").select(
        "survey_id", "bibkey", F.col("llm_error").alias("reason")
    ).unionByName(
        checked.filter("align_reason IS NOT NULL")
        .select("survey_id", "bibkey", F.col("align_reason").alias("reason"))
    )
    return merged, dead


# ---------------------------------------------------------------------------
# hidden block: L9 feedback → fused conv block → fused self-refine
# ---------------------------------------------------------------------------


def feedback_suggestions(digests: DataFrame, outlines: DataFrame, client_factory,
                         retry: RetryPolicy | None = None,
                         cfg: V2Config | None = None,
                         metrics=None) -> DataFrame:
    ps = _prompt_set(cfg) if cfg is not None else None
    per_group = (
        digests.withColumn("__d", F.struct(F.col("pos").alias("k"),
                                           F.col("description").alias("v")))
        .groupBy("survey_id", "digest_id")
        .agg(F.concat_ws("\n", F.transform(F.array_sort(F.collect_list("__d")),
                                           lambda s: s["v"])).alias("digest_content"))
        .join(F.broadcast(outlines.select("survey_id", "survey_title", "outline_md")),
              "survey_id")
    )
    out = llm_stage(
        per_group,
        build_prompt=lambda r: _feedback_prompt(
            ps, r["survey_title"], r["outline_md"], r["digest_content"]),
        parse=_parse_suggestion,
        client_factory=client_factory,
        payload_fields=_payload("suggestion"),
        keep_cols=["survey_id", "digest_id"],
        retry=retry,
        metrics=metrics,
    ).filter("llm_ok")
    return out.select(
        "survey_id",
        F.concat(F.lit("s"), F.col("digest_id").cast("string")).alias("sugg_id"),
        F.col("suggestion").alias("content"),
    )


# ---------------------------------------------------------------------------
# LLM-batch-coalescing (SURVEY §4 optional optimization, r12 verdict task #6):
# the in-cycle L7 digest → A3 merge → L9 feedback chain as ONE stage
# ---------------------------------------------------------------------------

_FUSED_DF_SCHEMA = T.StructType([
    T.StructField("survey_id", _STR, False),
    T.StructField("digest_id", T.IntegerType(), False),
    T.StructField("row_type", _STR, False),          # 'digest' | 'suggestion'
    T.StructField("pos", T.IntegerType(), True),
    T.StructField("description", _STR, True),
    T.StructField("all_bibkeys", T.ArrayType(_STR), True),
    T.StructField("content", _STR, True),
])


def digest_feedback_fused(
    papers_grouped: DataFrame,
    outlines: DataFrame,
    client_factory,
    cfg: V2Config,
    retry: RetryPolicy | None = None,
    metrics=None,
    feedback_metrics=None,
) -> tuple[DataFrame, DataFrame]:
    """The block cycle's digest→feedback chain coalesced into ONE
    ``applyInPandas`` over PER-SURVEY groups — the SURVEY §4 "coalesce
    adjacent LLM mapInPandas ops sharing a model" strategy, taken one
    level further in r14 (verdict task #7): when ``cfg.llm_threads > 1``
    the stage groups by ``survey_id`` alone (was: (survey_id,
    digest_id)), cutting it from surveys×digest-groups Arrow groups to
    one per survey — one client construction and one outline parse per
    SURVEY instead of per digest group — while ``llm_threads`` fans the
    independent digest groups out inside each survey (the reference's
    own per-node worker pool), so the intra-survey parallelism the finer
    grouping provided is preserved.  At ``llm_threads=1`` the per-group
    keying is KEPT: per-survey grouping would run every digest group of
    a survey serially in one task, a measured regression on the
    single-survey v3 host (bench run: v3_host_e2e 8.7 → 12.2 s before
    this guard).  LLM call count, prompts and replies are UNCHANGED
    either way (per-group bodies run verbatim; metric adds are applied
    outside the thread pool so accumulator counts stay exact), pinned by
    tests/test_v2_fused.py::test_fused_per_survey_threading_identical,
    which compares the two groupings directly.

    Unfused, each cycle costs: a mapInPandas digest stage over papers, a
    node explode + merge aggregation (shuffle), a per-group concat
    aggregation (second shuffle on the same key), a broadcast join back
    to outlines, and a second mapInPandas feedback stage — five stage
    boundaries and two Arrow round-trips for rows that were already
    co-grouped by (survey_id, digest_id).  Fused, the chain is one
    shuffle (the groupBy) and one Python pass: per group, every paper's
    L7 digest call, the J1 align gate (align_reason_py), the A3 merge
    (the documented deterministic contract of
    digest_ops.merge_digest_descriptions, replayed in Python), and the
    L9 feedback call run against the group's merged digest — one client,
    zero intermediate materialization.  Both LLM prompts come from the
    SAME builders as the staged path (_digest_prompt/_feedback_prompt),
    so the two paths are byte-identical by construction;
    tests/test_v2_fused.py asserts exact output equality and bench rows
    v2_digest_feedback_{unfused,fused} price the pair.

    Returns ``(digests, suggestions)`` with exactly the staged schemas
    (make_digests' merged digests; feedback_suggestions' output).  Both
    are views over one eagerly-checkpointed fused frame, so the LLM
    calls run once no matter how many times either side is consumed.
    Dead letters are dropped (matching the run_v2_survey loop, which
    discards make_digests' dead-letter frame).
    """
    if retry is None:
        retry = getattr(client_factory(), "retry_policy", None) or RetryPolicy()
    ps = _prompt_set(cfg)
    o = outlines.select("survey_id", "survey_title", "outline_md")
    joined = papers_grouped.drop("survey_title").join(F.broadcast(o), "survey_id")
    joined = joined.withColumn("digest_id", F.col("digest_id").cast("int"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        client = client_factory()      # ONE per survey (r14; was per group)
        survey_id = pdf["survey_id"].iloc[0]
        title = pdf["survey_title"].iloc[0]
        outline_md = pdf["outline_md"].iloc[0]
        # outline parse/serialize once per survey (r14; was per group —
        # it depends only on (title, outline_md))
        placeholder_md = skeleton.serialize_outline_py(
            skeleton.parse_outline_py(title, outline_md),
            with_digest_placeholder=True)

        def _count(prompt, reply, m):
            if m is not None:
                m.calls.add(1)
                m.prompt_chars.add(len(prompt))
                if reply is None:
                    m.failures.add(1)
                else:
                    m.reply_chars.add(len(reply))

        def one_group(g: pd.DataFrame) -> tuple[list[dict], list[tuple]]:
            """The verbatim per-(survey, digest)-group body.  Returns
            (output rows, deferred metric events) — metric adds happen
            OUTSIDE the thread pool so accumulator counts stay exact."""
            digest_id = int(g["digest_id"].iloc[0])
            events: list[tuple] = []
            # L7 per paper + J1 align gate; order within the group is
            # irrelevant to the output (per-paper calls are independent)
            good: list[tuple[str, list[dict]]] = []   # (bibkey, nodes)
            for row in g.sort_values("bibkey").to_dict("records"):
                prompt = _digest_prompt(ps, title, row["bibkey"],
                                        row["content"], outline_md,
                                        placeholder_md)
                reply, _err, _att = call_with_retry(client, prompt, retry)
                events.append((metrics, prompt, reply))
                if reply is None:
                    continue
                try:
                    md = _parse_fenced_with_suggestion(reply)["md"]
                except Exception:   # any parse error == staged llm_ok=false
                    continue
                if md is None or skeleton.align_reason_py(title, outline_md,
                                                          md):
                    continue
                good.append((row["bibkey"],
                             skeleton.parse_outline_py(title, md)))

            rows: list[dict] = []
            if good:
                # A3 merge — the deterministic contract of
                # digest_ops.merge_digest_descriptions with
                # bibkeys=[bibkey]: per pos, non-empty entries sorted by
                # (bibkey, entry) joined on the 20-dash separator;
                # all_bibkeys = sorted distinct over ALL papers
                # contributing rows at that pos
                by_pos: dict[int, list[tuple[str, str]]] = {}
                keys_at: dict[int, set] = {}
                for bibkey, nodes in good:
                    for n in nodes:
                        keys_at.setdefault(n["pos"], set()).add(bibkey)
                        desc = n["description"]
                        if desc:
                            by_pos.setdefault(n["pos"], []).append(
                                (bibkey,
                                 f"Paper bibkey: [{bibkey}]\nDigest: \n{desc}"))
                        else:
                            by_pos.setdefault(n["pos"], [])
                merged: list[tuple[int, str]] = []
                for pos in sorted(by_pos):
                    desc = digest_ops.MERGE_SEPARATOR.join(
                        v for _k, v in sorted(by_pos[pos]))
                    merged.append((pos, desc))
                    rows.append({
                        "survey_id": survey_id, "digest_id": digest_id,
                        "row_type": "digest", "pos": pos, "description": desc,
                        "all_bibkeys": sorted(keys_at[pos]), "content": None,
                    })
                # L9 feedback over the merged group (feedback_suggestions'
                # digest_content: descriptions sorted by pos, '\n'-joined)
                digest_content = "\n".join(d for _p, d in merged)
                prompt = _feedback_prompt(ps, title, outline_md,
                                          digest_content)
                reply, _err, _att = call_with_retry(client, prompt, retry)
                events.append((feedback_metrics, prompt, reply))
                if reply is not None:
                    try:  # any parse error == staged filter("llm_ok") drop
                        sugg = _parse_suggestion(reply)["suggestion"]
                        rows.append({
                            "survey_id": survey_id, "digest_id": digest_id,
                            "row_type": "suggestion", "pos": None,
                            "description": None, "all_bibkeys": None,
                            "content": sugg,
                        })
                    except Exception:
                        pass
            return rows, events

        # independent digest groups fan out on the reference's worker
        # pool (cfg.llm_threads); the deterministic per-group bodies make
        # the result order-independent, and sort=True keeps the emitted
        # row order itself deterministic.  Under the (survey_id,
        # digest_id) keying (llm_threads=1) the pdf IS one digest group —
        # skip the pandas groupby machinery entirely (it measured ~1 ms
        # per Arrow group, a real tax at 256 groups).
        if pdf["digest_id"].nunique() == 1:
            results = [one_group(pdf)]
        else:
            groups = [g for _, g in pdf.groupby("digest_id", sort=True)]
            results = _pmap(one_group, groups, cfg.llm_threads)
        rows: list[dict] = []
        for g_rows, g_events in results:
            rows.extend(g_rows)
            for m, prompt, reply in g_events:
                _count(prompt, reply, m)
        return pd.DataFrame(
            rows, columns=[f.name for f in _FUSED_DF_SCHEMA.fields])

    group_keys = (["survey_id"] if cfg.llm_threads > 1
                  else ["survey_id", "digest_id"])
    fused = (
        joined.groupBy(*group_keys)
        .applyInPandas(run, schema=_FUSED_DF_SCHEMA)
        .localCheckpoint(eager=True)    # LLM calls run ONCE for both views
    )
    digests = fused.filter("row_type = 'digest'").select(
        "survey_id", "digest_id", "pos", "description", "all_bibkeys")
    suggestions = fused.filter("row_type = 'suggestion'").select(
        "survey_id",
        F.concat(F.lit("s"), F.col("digest_id").cast("string")).alias("sugg_id"),
        F.col("content"),
    )
    return digests, suggestions


# The score bookkeeping crosses the applyInPandas boundary as JSON strings:
# pyarrow's arrow_to_pandas segfaults on null deeply-nested list columns in
# this environment, and the lists are tiny survey metadata — they become real
# array<array<double>> columns JVM-side (from_json) after the block loop.
_CONV_SCHEMA = T.StructType([
    T.StructField("survey_id", _STR, False),
    T.StructField("survey_title", _STR, True),
    T.StructField("outline_md", _STR, True),
    T.StructField("eval_score", T.DoubleType(), True),
    T.StructField("block_avg_score", _STR, True),
    T.StructField("self_refine_score", _STR, True),
    T.StructField("conv_pool_sizes", _STR, True),
])


def _nested(val) -> list:
    import json

    return json.loads(val) if val else []


def _dumps(val: list) -> str:
    import json

    return json.dumps(val)


def convolution_block(outlines: DataFrame, suggestions: DataFrame, client_factory,
                      cfg: V2Config, retry: RetryPolicy | None = None) -> DataFrame:
    """convolution_module.py:38-127 as ONE ``applyInPandas`` stage: per
    survey, the initial single-suggestion pass then ``conv_layers`` rounds of
    T5 sample → L10 kernel → L11 modify → L12 eval, appending this cycle's
    per-layer average scores to ``block_avg_score``
    (convolution_module.py:45-122).  Layer capacity follows the reference's
    two modes (:80-97): while candidates / receptive_field still exceeds
    ``result_num``, POOLING — the new results replace the pool outright, so
    the candidate count contracts by the receptive field each layer;
    otherwise union + T1 top-k prune.  Documented divergence: the final
    best is argmax over the prune-accumulated state, which (unlike the
    reference's last-layer-only pool) can never lose an earlier layer's
    best outline.  → best (survey_id, survey_title, outline_md, eval_score)
    per survey."""
    retry = retry or RetryPolicy()
    cands = _conv_cands(outlines, suggestions)
    ps = _prompt_set(cfg)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        client = client_factory()
        out = _conv_group_py(client, retry, cfg, ps, pdf)
        if out is None:
            return pd.DataFrame(columns=[f.name for f in _CONV_SCHEMA.fields])
        return pd.DataFrame([out])

    return cands.groupBy("survey_id").applyInPandas(run, _CONV_SCHEMA)


def _conv_cands(outlines: DataFrame, suggestions: DataFrame) -> DataFrame:
    return suggestions.join(
        F.broadcast(outlines.select("survey_id", "survey_title", "outline_md",
                                    "block_avg_score", "self_refine_score",
                                    "conv_pool_sizes")),
        "survey_id",
    )


def _conv_group_py(client, retry, cfg: V2Config, ps, pdf: pd.DataFrame) -> dict | None:
    """Per-survey convolution-block body, shared VERBATIM by the staged
    stage (:func:`convolution_block`) and the fused conv+refine stage
    (:func:`conv_refine_fused`) — one definition is what makes the two
    paths byte-identical by construction.  Returns the best-outline row
    dict (``_CONV_SCHEMA`` fields) or ``None`` when every chain died."""
    conv_layers, receptive_field = cfg.conv_layers, cfg.receptive_field
    result_num, top_k, seed, threads = (cfg.result_num, cfg.top_k, cfg.seed,
                                        cfg.llm_threads)
    sid = pdf["survey_id"].iloc[0]
    title = pdf["survey_title"].iloc[0]
    outline_md = pdf["outline_md"].iloc[0]

    def modify_eval(item: tuple[str, str]) -> dict | None:
        return _modify_eval_py(client, retry, title, outline_md, *item,
                               ps=ps)

    init = sorted(zip(pdf["sugg_id"], pdf["content"]))
    state = [r for r in _pmap(modify_eval, init, threads) if r]
    cycle_scores: list[float] = []
    if state:
        cycle_scores.append(float(np.mean([r["score"] for r in state])))
    cycle = len(_nested(pdf["block_avg_score"].iloc[0]))
    pool_sizes: list[int] = [len(state)]
    for layer in range(conv_layers):
        # fresh per-layer RandomState, seeded on (survey, block cycle,
        # layer) — deterministic and independent of executor placement,
        # while two layers over identical pool contents still draw
        # distinct sample groups (the reference's module-level numpy RNG
        # evolves across layers; a bare survey seed would not)
        rng = np.random.RandomState(
            sampling.survey_seed(f"{sid}:{cycle}:{layer}", seed))
        pool = sorted(state, key=lambda r: r["sugg_id"])
        groups = sampling.sample_suggestion_groups(
            [r["sugg_id"] for r in pool], [r["score"] for r in pool],
            receptive_field, result_num, rng,
        )
        by_id = {r["sugg_id"]: r for r in pool}

        def kernel(item: tuple[int, list[str]]) -> tuple[str, str] | None:
            gid, members = item
            if len(members) > 1:
                joined = "\n---\n".join(
                    by_id[m]["content"] for m in sorted(members))
                reply = _call(client, _kernel_prompt(
                    title, joined, ps, outline_md), retry)
                if reply is None:
                    return None
                try:
                    content = _parse_suggestion(reply)["suggestion"]
                except ValueError:
                    return None
            else:
                content = by_id[members[0]]["content"]
            return (f"l{layer}g{gid}", content)

        new_cands = [c for c in _pmap(kernel, enumerate(groups), threads) if c]
        new_state = [r for r in _pmap(modify_eval, new_cands, threads) if r]
        if new_state:
            cycle_scores.append(
                float(np.mean([r["score"] for r in new_state])))
        if len(pool) / receptive_field > result_num:
            # pooling (convolution_module.py:80-85): replace, no prune —
            # contracts a large candidate pool by the receptive field
            state = new_state if new_state else state
        else:
            # conv_results_old + conv_results_new → T1 prune
            state = _prune_py(state + new_state, top_k)
        pool_sizes.append(len(state))

    best = _prune_py(state, 1)
    if not best:
        return None
    block_scores = _nested(pdf["block_avg_score"].iloc[0]) + [cycle_scores]
    return {
        "survey_id": sid, "survey_title": title,
        "outline_md": best[0]["new_outline_md"],
        "eval_score": best[0]["score"],
        "block_avg_score": _dumps(block_scores),
        "self_refine_score": pdf["self_refine_score"].iloc[0] or "[]",
        "conv_pool_sizes": _dumps(
            _nested(pdf["conv_pool_sizes"].iloc[0]) + [pool_sizes]),
    }


def self_refine(best: DataFrame, client_factory, cfg: V2Config,
                retry: RetryPolicy | None = None) -> DataFrame:
    """refine_module.py:25-66 as one ``applyInPandas`` stage: per survey,
    ``refine_rounds`` rounds of best-of L13→L11→L12 chains, keeping the max
    (ties prefer the kept state, matching the staged 'keep' < 'r…c…' key
    order), appending this cycle's round×chain scores to
    ``self_refine_score`` (refine_module.py:52-63).

    Documented divergence (mirrors :func:`convolution_block`'s): the
    reference unconditionally adopts the best NEW outline each round even
    when it scores below the incumbent (refine_module.py:49-52); here the
    incumbent competes in the pool, so a refine round can never regress the
    running best.  Monotone state is deliberate — at cluster scale a single
    low-scoring round must not destroy a survey's accumulated outline."""
    retry = retry or RetryPolicy()
    ps = _prompt_set(cfg)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        client = client_factory()
        return pd.DataFrame([_refine_group_py(client, retry, cfg, ps,
                                              pdf.iloc[0])])

    return best.groupBy("survey_id").applyInPandas(run, _CONV_SCHEMA)


def _refine_group_py(client, retry, cfg: V2Config, ps, row) -> dict:
    """Per-survey self-refine body, shared VERBATIM by the staged stage
    (:func:`self_refine`) and the fused conv+refine stage
    (:func:`conv_refine_fused`).  ``row`` is any mapping carrying the
    ``_CONV_SCHEMA`` fields (a pandas row or the conv body's dict)."""
    refine_rounds, best_of, threads = cfg.refine_rounds, cfg.best_of, cfg.llm_threads
    sid, title = row["survey_id"], row["survey_title"]
    state_md, state_score = row["outline_md"], float(row["eval_score"])
    state_detail = ""          # incumbent's eval text (DIGEST_FREE slot)
    cycle_scores: list[list[float]] = []
    for rnd in range(refine_rounds):
        outline_now = state_md
        detail_now = state_detail

        def chain(chain_id: int) -> tuple[str, str] | None:
            reply = _call(
                client, _refine_prompt(chain_id, rnd, title, outline_now,
                                       ps, detail_now), retry)
            if reply is None:
                return None
            try:
                content = _parse_suggestion(reply)["suggestion"]
            except ValueError:
                return None
            return (f"r{rnd}c{chain_id}", content)

        def modify_eval(item: tuple[str, str]) -> dict | None:
            return _modify_eval_py(client, retry, title, outline_now, *item,
                                   ps=ps)

        cands = [c for c in _pmap(chain, range(best_of), threads) if c]
        results = [r for r in _pmap(modify_eval, cands, threads) if r]
        cycle_scores.append(
            sorted((r["score"] for r in results), reverse=True))
        pool = results + [{"sugg_id": "keep", "new_outline_md": state_md,
                           "score": state_score,
                           "eval_detail": state_detail}]
        top = _prune_py(pool, 1)[0]
        state_md, state_score = top["new_outline_md"], top["score"]
        state_detail = top.get("eval_detail") or ""
    return {
        "survey_id": sid, "survey_title": title,
        "outline_md": state_md, "eval_score": state_score,
        "block_avg_score": row["block_avg_score"] or "[]",
        "self_refine_score": _dumps(
            _nested(row["self_refine_score"]) + [cycle_scores]),
        "conv_pool_sizes": row["conv_pool_sizes"] or "[]",
    }


def conv_refine_fused(outlines: DataFrame, suggestions: DataFrame,
                      client_factory, cfg: V2Config,
                      retry: RetryPolicy | None = None) -> DataFrame:
    """The block cycle's convolution→self-refine chain coalesced into ONE
    ``applyInPandas`` over survey groups (the SURVEY §4 LLM-coalescing
    strategy, same shape as :func:`digest_feedback_fused`).

    Staged, the chain is two FlatMapGroupsInPandas stages on the SAME
    ``survey_id`` key — convolution emits exactly one row per survey, yet
    Catalyst cannot know the output keying matches the input's, so
    ``self_refine``'s groupBy pays a second full exchange + Arrow
    round-trip + client construction for one-row groups.  Fused, both
    per-group bodies (:func:`_conv_group_py`, :func:`_refine_group_py` —
    the very functions the staged stages call) run back-to-back in one
    Python pass with one client: one exchange per cycle instead of two.
    Byte-identical by construction; tests/test_v2_fused.py asserts exact
    staged-vs-fused output equality."""
    retry = retry or RetryPolicy()
    cands = _conv_cands(outlines, suggestions)
    ps = _prompt_set(cfg)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        client = client_factory()
        best = _conv_group_py(client, retry, cfg, ps, pdf)
        if best is None:
            return pd.DataFrame(columns=[f.name for f in _CONV_SCHEMA.fields])
        return pd.DataFrame([_refine_group_py(client, retry, cfg, ps, best)])

    return cands.groupBy("survey_id").applyInPandas(run, _CONV_SCHEMA)


# ---------------------------------------------------------------------------
# decode: L14 orchestra → A6 assembly → P12/A7 → survey rows
# ---------------------------------------------------------------------------


_DONE_SCHEMA = T.StructType([
    T.StructField("survey_id", _STR, False),
    T.StructField("pos", T.IntegerType(), False),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("title", _STR, True),
    T.StructField("content", _STR, True),
])


def decode_survey(final_outline: DataFrame, digests: DataFrame, papers: DataFrame,
                  client_factory, cfg: V2Config,
                  retry: RetryPolicy | None = None,
                  metrics=None) -> DataFrame:
    """content.py:108-146 decode: leaf sections get prose from their digest
    material (L14 orchestra — the per-section fan-out stays a row-parallel
    llm_stage), then ONE per-survey ``applyInPandas`` walks the tree
    bottom-up, summarizing parents from their children and polishing
    (content.py:139-146 ready-queue semantics, without the level-synchronous
    global barrier: each survey proceeds independently)."""
    retry = retry or RetryPolicy()
    ps = _prompt_set(cfg)
    outline_meta = final_outline.select("survey_id", "survey_title",
                                        "outline_md")
    nodes = skeleton.parse_outlines(
        final_outline, title_col="survey_title", md_col="outline_md"
    )
    # leaf = node with no children (content.py:139-146: leaves seed the
    # ready queue)
    leaves = nodes.filter(F.col("n_children") == 0)

    # digest material per (survey, pos)
    section_digests = (
        digests.withColumn("__d", F.struct(F.col("digest_id").alias("k"),
                                           F.col("description").alias("v")))
        .groupBy("survey_id", "pos")
        .agg(F.concat_ws("\n", F.transform(F.array_sort(F.collect_list("__d")),
                                           lambda s: s["v"])).alias("material"))
    )
    leaf_in = leaves.join(section_digests, ["survey_id", "pos"], "left") \
        .join(F.broadcast(outline_meta), "survey_id")
    contents = llm_stage(
        leaf_in.withColumn("material", F.coalesce("material", F.lit(""))),
        build_prompt=lambda r: (
            ps["ORCHESTRA_PROMPT"].format(
                title=r["survey_title"], outline=r["outline_md"],
                digest=r["material"],
                section_title=r["title"])            # orchestra_module.py:70-78
            if ps else
            f"[ORCHESTRA] Survey title: {r['survey_title']}\n"
            f"Section title: {r['title']}\n"
            f"Digests:\n{r['material'][:3000]}\n"
            "Write the section prose, citing papers as [bibkey]."
        ),
        parse=lambda s: {"content": s},
        client_factory=client_factory,
        payload_fields=_payload("content"),
        keep_cols=["survey_id", "pos"],
        retry=retry,
        metrics=metrics,
    ).filter("llm_ok").select("survey_id", "pos", "content")

    # A6 bottom-up assembly + L15 polish, fused per survey.  Parent sections
    # carry their own digest material too: the reference orchestra module
    # fills the SUMMARY_PROMPT {digest} slot with the section's digest
    # content (orchestra_module.py:70-78), not an empty string.
    asm_in = (
        nodes.select("survey_id", "pos", "node_path", "depth", "title", "n_children")
        .join(contents, ["survey_id", "pos"], "left")
        .join(section_digests, ["survey_id", "pos"], "left")
        .join(F.broadcast(outline_meta), "survey_id")
    )
    polish, threads = cfg.polish, cfg.llm_threads

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        client = client_factory()
        rows = pdf.sort_values("pos").to_dict("records")
        survey_title = rows[0]["survey_title"]
        content: dict[int, str] = {
            r["pos"]: r["content"] for r in rows
            if r["n_children"] == 0 and r["content"] is not None
        }
        children_of: dict[tuple, list[dict]] = {}
        for r in rows:
            path = tuple(r["node_path"])
            if len(path) > 1:
                children_of.setdefault(path[:-1], []).append(r)
        # bottom-up: deepest parents first; a parent whose children all
        # failed stays contentless (same as the staged inner-join semantics)
        parents = [r for r in rows if r["n_children"] > 0]
        for r in sorted(parents, key=lambda r: (-r["depth"], r["pos"])):
            kids = [content[c["pos"]]
                    for c in children_of.get(tuple(r["node_path"]), [])
                    if c["pos"] in content]
            if not kids:
                continue
            reply = _call(
                client,
                _summary_prompt(survey_title, r["title"], "\n\n".join(kids),
                                ps, outline=rows[0].get("outline_md") or "",
                                digest=r.get("material") or ""),
                retry)
            if reply is not None:
                content[r["pos"]] = reply
        out_rows = [
            {"survey_id": r["survey_id"], "pos": r["pos"], "depth": r["depth"],
             "title": r["title"], "content": content[r["pos"]]}
            for r in rows if r["pos"] in content
        ]
        if polish:
            replies = _pmap(
                lambda r: _call(client, _polish_prompt(r["title"], r["content"],
                                                       ps),
                                retry),
                out_rows, threads)
            out_rows = [
                {**r, "content": rep} for r, rep in zip(out_rows, replies)
                if rep is not None
            ]
        return pd.DataFrame(out_rows, columns=[f.name for f in _DONE_SCHEMA.fields])

    done = asm_in.groupBy("survey_id").applyInPandas(assemble, _DONE_SCHEMA)

    # L16/J5 figures: propose from the assembled draft, anchor per section
    # (figure_module.py:27-48)
    if cfg.figures:
        from llmxmapreduce_spark.operators.figures import anchor_figures, generate_figures

        # draft includes section headings so the model can reference them
        draft_with_heads = (
            done.withColumn("__s", F.struct(
                F.col("pos").alias("k"),
                F.concat(F.lit("## "), F.col("title"), F.lit("\n"),
                         F.col("content")).alias("v")))
            .groupBy("survey_id")
            .agg(F.concat_ws("\n\n", F.transform(
                F.array_sort(F.collect_list("__s")), lambda s: s["v"])).alias("content_md"))
            .join(F.broadcast(outline_meta), "survey_id")
        )
        figs = generate_figures(draft_with_heads, client_factory, retry)
        done = anchor_figures(done, figs)

    # r13: decode_tail consumes `done` through THREE plan branches
    # (sections → renumbered → {cite_ratio, assembled} plus the
    # assembled join's own done.select), and exchange reuse cannot
    # dedupe a FlatMapGroupsInPandas ABOVE the shared exchange — without
    # an eager cut the leaf-prose llm_stage and the assemble stage (and
    # in figures mode the L16 figure stage) execute 3× per action
    # (measured: the decode LLM accumulator showed 768 calls for 256
    # leaves).  One section-bounded checkpoint runs them once.
    # Retention: run_v2_survey releases it once `out` is checkpointed;
    # v3_host's per-tool snapshot diff releases it at close(); direct
    # callers keep one bounded frame per call (same class as the final
    # digest cut).
    done = done.localCheckpoint(eager=True)

    tail = decode_tail(done, papers)
    return (
        tail.join(F.broadcast(final_outline), "survey_id")
        .select("survey_id", "survey_title", "outline_md", "content_md",
                "ref_str", "cite_ratio", "n_papers", "n_sections", "eval_score",
                "block_avg_score", "self_refine_score", "conv_pool_sizes")
    )


def decode_tail(done: DataFrame, papers: DataFrame) -> DataFrame:
    """The deterministic decode suffix (decode_pipeline.py:115-156): P12
    citation renumbering over the assembled sections, A7 cite_ratio, the
    ``## References`` block, and the per-survey markdown assembly.  LLM-free
    — exercised hash-checked by the ``v2_decode_tail`` oracle query.

    ``done``: (survey_id, pos, depth, title, content) section rows.
    → (survey_id, content_md, n_sections, cite_ratio, n_papers, ref_str).
    """
    sections = done.select("survey_id", "pos", "content")
    renumbered = renumber_citations(sections, papers)
    ratios = a7_cite_ratio(renumbered, papers)
    refs = references_block(papers)

    assembled = (
        renumbered.join(done.select("survey_id", "pos", "depth", "title"),
                        ["survey_id", "pos"])
        .withColumn("__s", F.struct(
            F.col("pos").alias("k"),
            F.concat(F.repeat(F.lit("#"), F.col("depth") + 1), F.lit(" "),
                     F.col("title"), F.lit("\n"), F.col("content")).alias("v"),
        ))
        .groupBy("survey_id")
        .agg(
            F.concat_ws("\n\n", F.transform(F.array_sort(F.collect_list("__s")),
                                            lambda s: s["v"])).alias("content_md"),
            F.count(F.lit(1)).alias("n_sections"),
        )
    )
    return (
        assembled.join(ratios, "survey_id", "left")
        .join(refs, "survey_id", "left")
    )


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------


def run_v2_survey(surveys: DataFrame, client_factory,
                  cfg: V2Config | None = None,
                  retry: RetryPolicy | None = None,
                  stage_metrics=None) -> DataFrame:
    """SURVEYS_INPUT rows → one output row per survey (S5 shape).

    Implements the reference's block cycle (hidden_pipeline.py:73-85): while
    ``block_cycle_count < block_count``, the survey loops
    ``digest → skeleton_refine → digest`` — so decode always consumes digests
    regenerated against the *refined* outline, and the digest→section join
    in :func:`decode_survey` cannot misalign when refinement restructures the
    outline.  ``block_count=0`` decodes the unrefined outline (args.py:21
    default); the shipped script uses 1 (scripts/pipeline_start.sh:13).

    ``stage_metrics``: optional
    :class:`~llmxmapreduce_spark.operators.stage_metrics.StageMetrics` —
    per-stage rows-out (``observe``), wall time at the checkpoint
    boundaries, and LLM accumulators for the four row-parallel llm stages
    (outline / digest / suggest / decode); the reference analyser's
    per-node table (pipeline_analyser.py:64-124).  After collecting the
    result, fold the per-layer convolution detail in with
    ``stage_metrics.record_v2_layers(rows)``.
    """
    cfg = cfg or V2Config()
    sm = stage_metrics
    spark = surveys.sparkSession
    prev_parts = None
    prev_aqe = None
    if cfg.shuffle_partitions is not None:
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        # r13: a caller that sizes shuffle_partitions is declaring this a
        # KB-per-survey control plane; AQE's per-shuffle re-optimization
        # is pure driver latency on such frames (the run is ~40 jobs of
        # 1-2 tiny tasks each — measured 15-25% of refdefaults wall) and
        # has nothing to coalesce or skew-split at ANY cluster size, so
        # it is turned off for the pipeline and restored with the
        # partition count.  Plan-only: AQE never changes values.
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    cache_ids: set = set()   # cached-digest frames (set before try: the
    try:                     # error path releases them, r13 discipline)
        papers = build_papers(surveys)
        if sm is not None:
            papers = sm.observe("papers", papers)
        papers = papers.localCheckpoint(eager=True)
        if sm is not None:
            sm.materialized("papers")
        grouped = group_papers(papers, cfg, client_factory, retry)
        init_fn = (init_outlines_fused if cfg.fused_init_outlines
                   else init_outlines)
        outlines = init_fn(
            grouped, client_factory, cfg, retry,
            metrics=sm.llm("outline") if sm is not None else None)
        if sm is not None:
            outlines = sm.observe("outline", outlines)
        outlines = outlines.localCheckpoint(eager=True)
        if sm is not None:
            sm.materialized("outline")
        fused_df = cfg.fused_digest_feedback
        # Cached-digest ledger: with cfg.llm_cache_dir the digest stage
        # runs EAGERLY at make_digests call time and pins two bounded
        # frames (hash pre-pass + fresh results, llm_op.py contract);
        # each cycle's digest localCheckpoint is their last reader, so
        # they release right after it materializes.
        _c_snap = pinned_ids(surveys.sparkSession.sparkContext)
        if not fused_df:
            digests, _dead = make_digests(
                grouped, outlines, client_factory, cfg, retry,
                metrics=sm.llm("digest") if sm is not None else None)
        cache_ids = (pinned_ids(surveys.sparkSession.sparkContext)
                     - _c_snap)
        cur = outlines.select(
            "survey_id", "survey_title", "outline_md",
            F.lit(None).cast("double").alias("eval_score"),
            F.lit("[]").alias("block_avg_score"),
            F.lit("[]").alias("self_refine_score"),
            F.lit("[]").alias("conv_pool_sizes"),
        )
        # Per-cycle checkpoint release (labelprop/pagerank discipline,
        # r12 audit): cycle N's refined-outline checkpoint is the LAST
        # reader of cycle N−1's `cur` blocks and of cycle N's own
        # digest checkpoint (suggestions → convolution → refine all
        # materialize into it), so both are released right after it —
        # otherwise the loop pins 2 × block_count survey-bounded frames
        # per run for the session.  Pre-loop checkpoints (papers,
        # outlines) stay: papers is re-read via `grouped` every cycle
        # and is the caller-cache shield (first materialization of the
        # surveys plan).
        _sctx = surveys.sparkSession.sparkContext

        prev_cur_ids: set = set()   # cur_0 is lazy over outlines: no blocks
        for _cycle in range(cfg.block_count):
            snap = pinned_ids(_sctx)
            if fused_df:
                # LLM-batch-coalescing: the cycle's digest→merge→feedback
                # chain is ONE applyInPandas stage; its checkpoint plays
                # the digest checkpoint's role in the release ledger.
                # Output-identical to the staged path (test_v2_fused).
                _dg, suggestions = digest_feedback_fused(
                    grouped, cur, client_factory, cfg, retry,
                    metrics=sm.llm("digest") if sm is not None else None,
                    feedback_metrics=(
                        sm.llm("suggest") if sm is not None else None))
            else:
                digests = digests.localCheckpoint(eager=True)
            digest_ids = pinned_ids(_sctx) - snap
            # the digest checkpoint (or fused frame) just superseded the
            # cached stage's eager frames from the make_digests that
            # produced it
            release(_sctx, cache_ids)
            cache_ids = set()
            if sm is not None:
                sm.materialized("digest")
            if not fused_df:
                suggestions = feedback_suggestions(
                    digests, cur, client_factory, retry, cfg=cfg,
                    metrics=sm.llm("suggest") if sm is not None else None)
            snap = pinned_ids(_sctx)
            if cfg.fused_conv_refine:
                cur = conv_refine_fused(cur, suggestions, client_factory,
                                        cfg, retry).localCheckpoint(eager=True)
            else:
                best = convolution_block(cur, suggestions, client_factory,
                                         cfg, retry)
                cur = self_refine(best, client_factory, cfg, retry) \
                    .localCheckpoint(eager=True)
            new_cur_ids = pinned_ids(_sctx) - snap
            release(_sctx, prev_cur_ids | digest_ids)
            prev_cur_ids = new_cur_ids
            if sm is not None:
                sm.materialized("refine")
            if not fused_df:
                # re-digest against the refined outline (digest_node
                # re-entry)
                _c_snap = pinned_ids(_sctx)
                digests, _dead = make_digests(
                    grouped, cur, client_factory, cfg, retry,
                    metrics=sm.llm("digest") if sm is not None else None)
                cache_ids = pinned_ids(_sctx) - _c_snap
        if fused_df:
            # fused mode skips the staged per-cycle re-digest; the decode
            # stage needs digests against the FINAL refined outline — the
            # same pass the staged loop runs at the end of its last cycle
            _c_snap = pinned_ids(_sctx)
            digests, _dead = make_digests(
                grouped, cur, client_factory, cfg, retry,
                metrics=sm.llm("digest") if sm is not None else None)
            cache_ids = pinned_ids(_sctx) - _c_snap
        if sm is not None:
            # rows-out of the FINAL digest pass (re-attached each loop exit;
            # the per-cycle llm("digest") counters accumulate across passes)
            digests = sm.observe("digest", digests)
        digests = digests.localCheckpoint(eager=True)
        release(_sctx, cache_ids)      # final pass's cached frames superseded
        cache_ids = set()
        if sm is not None:
            sm.materialized("digest")
        # lift the JSON score bookkeeping back into typed nested arrays now
        # that no pandas boundary remains (see _CONV_SCHEMA note)
        cur = cur.withColumn(
            "block_avg_score", F.from_json("block_avg_score", _BLOCK_SCORES)
        ).withColumn(
            "self_refine_score", F.from_json("self_refine_score", _REFINE_SCORES)
        ).withColumn(
            "conv_pool_sizes", F.from_json("conv_pool_sizes", _POOL_SIZES)
        )
        _d_snap = pinned_ids(_sctx)
        out = decode_survey(
            cur, digests, papers, client_factory, cfg, retry,
            metrics=sm.llm("decode") if sm is not None else None,
        ).withColumn("block_cycle_count", F.lit(cfg.block_count))
        decode_ids = pinned_ids(_sctx) - _d_snap   # the `done` section cut
        if sm is not None:
            out = sm.observe("decode", out)
        if cfg.shuffle_partitions is not None:
            # materialize before the session conf is restored, so the decode
            # shuffles actually run at the pipeline's sizing
            out = out.localCheckpoint(eager=True)
            # the out checkpoint supersedes decode_survey's internal
            # `done` cut (out is its only reader)
            release(_sctx, decode_ids)
            if sm is not None:
                sm.materialized("decode")
        return out
    except BaseException:
        # nothing is returned on the error path, so any cached-digest
        # frames not yet superseded by a digest checkpoint are releasable
        release(spark.sparkContext, cache_ids)
        raise
    finally:
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_aqe is not None:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
