"""V2 survey-generation pipeline (reference: LLMxMapReduce_V2, SURVEY.md §3.2).

Stages, each a DataFrame→DataFrame operator; the reference's gevent actor
DAG becomes a linear chain of Spark jobs with two bounded driver loops
(convolution layers; content assembly by tree depth):

  surveys ─ explode → papers ─ C7 group → digest groups
    ├─ C6 batch → L5 init outlines → L6 concat → outline          (encode)
    ├─ L7 per-paper digest → J1 align → A3 merge → digests        (hidden)
    ├─ L9 feedback → [conv layers: T5 sample → L10 kernel →
    │     L11 modify → L12 eval → T1 prune] → best outline        (refine)
    └─ decode: L14 orchestra leaves → A6 level-synchronous
          assembly → L15 polish → P12/J3 renumber → A7 → S5-shape (decode)

Determinism: every shuffle the reference does with ``random.shuffle``
is a keyed-hash order here; T5 sampling uses a per-survey seeded
RandomState; the mock client is prompt-hash deterministic — two runs are
byte-identical (tests/test_v2_pipeline.py).

Scale: surveys are rows, never driver objects; per-survey tree work rides
``applyInPandas``; the only driver-side state is the loop counter and the
per-survey suggestion pools (≤ result_num ≈ 10 rows each, the same bound
the reference holds in memory).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from llmxmapreduce_spark.functions import text as X
from llmxmapreduce_spark.llm.client import RetryPolicy
from llmxmapreduce_spark.operators import digest_ops, grouping, sampling, skeleton
from llmxmapreduce_spark.operators.citations import cite_ratio as a7_cite_ratio
from llmxmapreduce_spark.operators.citations import references_block, renumber_citations
from llmxmapreduce_spark.operators.llm_op import llm_stage
from llmxmapreduce_spark.operators.topk import prune_top_k


@dataclass
class V2Config:
    digest_batch: int = 3        # --digest_group_mode batch size (args.py:18)
    skeleton_batch: int = 3      # skeleton_group_size (args.py:19)
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


_STR = T.StringType()


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
                                         cfg.digest_batch, retry)
    return grouping.hash_shuffled_batches(
        papers, "bibkey", cfg.digest_batch, seed=cfg.seed,
        partition_cols=["survey_id"], group_col="digest_id",
    )


# ---------------------------------------------------------------------------
# skeleton init: C6 → L5 → L6
# ---------------------------------------------------------------------------


def init_outlines(papers_grouped: DataFrame, client_factory, cfg: V2Config,
                  retry: RetryPolicy | None = None) -> DataFrame:
    """→ (survey_id, survey_title, outline_md)."""
    batches = grouping.hash_shuffled_batches(
        papers_grouped.select("survey_id", "digest_id").distinct(),
        "digest_id", cfg.skeleton_batch, seed=cfg.seed + 1,
        partition_cols=["survey_id"], group_col="batch_id",
    )
    joined = papers_grouped.join(batches, ["survey_id", "digest_id"])
    abstract_fmt = F.concat(
        F.lit("Bibkey: '"), F.col("bibkey"), F.lit("':\nAbstract:\n"),
        F.substring(F.col("abstract"), 1, 1500),
    )
    per_batch = (
        joined.withColumn("__a", F.struct(F.col("bibkey").alias("k"),
                                          abstract_fmt.alias("v")))
        .groupBy("survey_id", "survey_title", "batch_id")
        .agg(F.concat_ws(
            "\n---------------------\n",
            F.transform(F.array_sort(F.collect_list("__a")), lambda s: s["v"]),
        ).alias("abstracts"))
    )
    single = llm_stage(
        per_batch,
        build_prompt=lambda r: (
            f"[INIT_OUTLINE] Survey title: {r['survey_title']}\n"
            f"Propose a markdown outline (## sections with Digest "
            f"Construction/Analysis) for these papers.\nAbstracts:\n{r['abstracts']}\n"
            "Reply with a fenced ```markdown block."
        ),
        parse=_parse_fenced,
        client_factory=client_factory,
        payload_fields=_payload("md"),
        keep_cols=["survey_id", "survey_title", "batch_id"],
        retry=retry,
    ).filter("llm_ok")
    per_survey = (
        single.withColumn("__o", F.struct(F.col("batch_id").alias("k"),
                                          F.col("md").alias("v")))
        .groupBy("survey_id", "survey_title")
        .agg(F.concat_ws(
            "\n--------------------------\n",
            F.transform(
                F.array_sort(F.collect_list("__o")),
                lambda s: F.concat(F.lit("```markdown\n"), s["v"], F.lit("\n```")),
            ),
        ).alias("outlines"))
    )
    return llm_stage(
        per_survey,
        build_prompt=lambda r: (
            f"[CONCAT_OUTLINE] Survey title: {r['survey_title']}\n"
            f"Merge these partial outlines into one.\n{r['outlines']}\n"
            "Reply with a fenced ```markdown block."
        ),
        parse=_parse_fenced,
        client_factory=client_factory,
        payload_fields=_payload("md"),
        keep_cols=["survey_id", "survey_title"],
        retry=retry,
    ).filter("llm_ok").select("survey_id", "survey_title",
                              F.col("md").alias("outline_md"))


# ---------------------------------------------------------------------------
# digests: L7 per paper → J1 align → A3 merge
# ---------------------------------------------------------------------------


def make_digests(papers_grouped: DataFrame, outlines: DataFrame, client_factory,
                 cfg: V2Config, retry: RetryPolicy | None = None
                 ) -> tuple[DataFrame, DataFrame]:
    """→ (digests (survey_id, digest_id, pos, description), dead_letters)."""
    outline_nodes = skeleton.parse_outlines(
        outlines, title_col="survey_title", md_col="outline_md"
    )
    placeholder = skeleton.serialize_outlines(
        outline_nodes, with_digest_placeholder=True
    ).withColumnRenamed("markdown", "placeholder_md")

    per_paper = papers_grouped.join(placeholder, "survey_id").join(
        outlines.select("survey_id", "survey_title").distinct(), ["survey_id", "survey_title"]
    )
    raw = llm_stage(
        per_paper,
        build_prompt=lambda r: (
            f"[DIGEST] Paper bibkey: {r['bibkey']}\n"
            f"Extract a digest aligned to this outline.\n"
            f"Paper:\n{(r['content'] or '')[:2000]}\n"
            f"Outline:\n```markdown\n{r['placeholder_md']}\n```\n"
            "Reply with a fenced ```markdown digest matching the outline "
            "structure and a ```suggestion block."
        ),
        parse=_parse_fenced_with_suggestion,
        client_factory=client_factory,
        payload_fields=_payload("md", "suggestion"),
        keep_cols=["survey_id", "survey_title", "digest_id", "bibkey"],
        retry=retry,
    )
    ok = raw.filter("llm_ok")
    digest_nodes = skeleton.parse_outlines(
        ok.withColumn("__id", F.concat_ws("|", "survey_id", "bibkey"))
          .select("__id", "survey_title", F.col("md").alias("markdown"),
                  "survey_id", "digest_id", "bibkey"),
        id_col="__id", title_col="survey_title", md_col="markdown",
    ).join(
        ok.select(F.concat_ws("|", "survey_id", "bibkey").alias("__id"),
                  "survey_id", "digest_id", "bibkey"),
        "__id",
    )
    matched, mismatched = skeleton.align_digest_nodes(
        outline_nodes, digest_nodes, id_cols=["survey_id"], digest_id_col="bibkey"
    )
    # keep only fully-aligned papers (reference raises + retries per paper;
    # here misaligned papers quarantine like D8 dead letters)
    bad_papers = mismatched.select("survey_id", "bibkey").distinct()
    good_nodes = digest_nodes.join(bad_papers, ["survey_id", "bibkey"], "left_anti")
    merged = digest_ops.merge_digest_descriptions(
        good_nodes.withColumn("bibkeys", F.array("bibkey")),
        id_cols=["survey_id", "digest_id"],
        digest_id_col="bibkey",
    )
    dead = raw.filter("NOT llm_ok").select(
        "survey_id", "bibkey", F.col("llm_error").alias("reason")
    ).unionByName(
        mismatched.select("survey_id", F.col("bibkey"), F.col("reason")).distinct()
    )
    return merged, dead


# ---------------------------------------------------------------------------
# convolution block: L9 → [T5 → L10 → L11 → L12 → T1]* → best outline
# ---------------------------------------------------------------------------


def feedback_suggestions(digests: DataFrame, outlines: DataFrame, client_factory,
                         retry: RetryPolicy | None = None) -> DataFrame:
    per_group = (
        digests.withColumn("__d", F.struct(F.col("pos").alias("k"),
                                           F.col("description").alias("v")))
        .groupBy("survey_id", "digest_id")
        .agg(F.concat_ws("\n", F.transform(F.array_sort(F.collect_list("__d")),
                                           lambda s: s["v"])).alias("digest_content"))
        .join(outlines, "survey_id")
    )
    out = llm_stage(
        per_group,
        build_prompt=lambda r: (
            f"[FEEDBACK] Survey title: {r['survey_title']}\n"
            f"Outline:\n```markdown\n{r['outline_md']}\n```\n"
            f"Digest group:\n{r['digest_content'][:3000]}\n"
            "Reply with a ```suggestion block."
        ),
        parse=_parse_suggestion,
        client_factory=client_factory,
        payload_fields=_payload("suggestion"),
        keep_cols=["survey_id", "digest_id"],
        retry=retry,
    ).filter("llm_ok")
    return out.select(
        "survey_id",
        F.concat(F.lit("s"), F.col("digest_id").cast("string")).alias("sugg_id"),
        F.col("suggestion").alias("content"),
    )


def _modify_and_eval(cands: DataFrame, client_factory, retry) -> DataFrame:
    """L11 modify + L12 eval for candidate (survey, sugg) pairs."""
    modified = llm_stage(
        cands,
        build_prompt=lambda r: (
            f"[MODIFY] Survey title: {r['survey_title']}\n"
            f"Outline:\n```markdown\n{r['outline_md']}\n```\n"
            f"Suggestion:\n```suggestion\n{r['content']}\n```\n"
            "Apply the suggestion; reply with a fenced ```markdown outline."
        ),
        parse=_parse_fenced,
        client_factory=client_factory,
        payload_fields=_payload("md"),
        keep_cols=["survey_id", "survey_title", "sugg_id", "content"],
        retry=retry,
    ).filter("llm_ok").withColumnRenamed("md", "new_outline_md")
    return llm_stage(
        modified,
        build_prompt=lambda r: (
            f"[EVAL_OUTLINE] Survey title: {r['survey_title']}\n"
            f"Outline:\n```markdown\n{r['new_outline_md']}\n```\n"
            "Score the information entropy 0-10 as <SCORE>x</SCORE>."
        ),
        parse=_parse_score,
        client_factory=client_factory,
        payload_fields=[T.StructField("score", T.DoubleType(), True)],
        keep_cols=["survey_id", "survey_title", "sugg_id", "content", "new_outline_md"],
        retry=retry,
    ).filter("llm_ok")


def convolution_block(outlines: DataFrame, suggestions: DataFrame, client_factory,
                      cfg: V2Config, retry: RetryPolicy | None = None) -> DataFrame:
    """convolution_module.py:38-127: initial single-suggestion pass, then
    ``conv_layers`` rounds of sample→kernel→modify→eval with top-k pruning.
    → (survey_id, survey_title, outline_md, eval_score) best outline."""
    spark = outlines.sparkSession
    # initial pass: each suggestion alone (kernel = identity for single input)
    cands = suggestions.join(outlines, "survey_id")
    state = _modify_and_eval(cands, client_factory, retry).select(
        "survey_id", "sugg_id", "content", "new_outline_md", "score"
    ).localCheckpoint(eager=True)

    sample_schema = T.StructType([
        T.StructField("survey_id", _STR, False),
        T.StructField("group_id", T.IntegerType(), False),
        T.StructField("members", T.ArrayType(_STR), False),
    ])

    def sample(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = pdf["survey_id"].iloc[0]
        rng_seed = sampling.survey_seed(str(sid), cfg.seed)
        import numpy as np

        rng = np.random.RandomState(rng_seed)
        pdf = pdf.sort_values("sugg_id")
        groups = sampling.sample_suggestion_groups(
            list(pdf["sugg_id"]), list(pdf["score"]),
            cfg.receptive_field, cfg.result_num, rng,
        )
        return pd.DataFrame([
            {"survey_id": sid, "group_id": gid, "members": members}
            for gid, members in enumerate(groups)
        ])

    for _layer in range(cfg.conv_layers):
        groups = state.groupBy("survey_id").applyInPandas(sample, sample_schema)
        member_rows = groups.select(
            "survey_id", "group_id", F.explode("members").alias("sugg_id")
        ).join(state, ["survey_id", "sugg_id"])
        merged_in = (
            member_rows.withColumn("__c", F.struct(F.col("sugg_id").alias("k"),
                                                   F.col("content").alias("v")))
            .groupBy("survey_id", "group_id")
            .agg(
                F.concat_ws("\n---\n",
                            F.transform(F.array_sort(F.collect_list("__c")),
                                        lambda s: s["v"])).alias("joined"),
                F.count(F.lit(1)).alias("n_members"),
            )
        )
        multi = llm_stage(
            merged_in.filter("n_members > 1").join(outlines, "survey_id"),
            build_prompt=lambda r: (
                f"[KERNEL] Survey title: {r['survey_title']}\n"
                f"Merge these suggestions into one:\n{r['joined']}\n"
                "Reply with a ```suggestion block."
            ),
            parse=_parse_suggestion,
            client_factory=client_factory,
            payload_fields=_payload("suggestion"),
            keep_cols=["survey_id", "group_id"],
            retry=retry,
        ).filter("llm_ok").select("survey_id", "group_id",
                                  F.col("suggestion").alias("content"))
        single = merged_in.filter("n_members = 1").select(
            "survey_id", "group_id", F.col("joined").alias("content")
        )
        new_cands = (
            multi.unionByName(single)
            .withColumn("sugg_id", F.concat(F.lit(f"l{_layer}g"),
                                            F.col("group_id").cast("string")))
            .drop("group_id")
            .join(outlines, "survey_id")
        )
        new_state = _modify_and_eval(new_cands, client_factory, retry).select(
            "survey_id", "sugg_id", "content", "new_outline_md", "score"
        )
        # conv_results_old + conv_results_new → T1 prune (tie-break by keyed
        # hash, the engine's seeded stand-in for random.sample)
        state = prune_top_k(
            state.unionByName(new_state), ["survey_id"], "score", cfg.top_k,
            tiebreak_col="sugg_id",
        ).localCheckpoint(eager=True)

    best = prune_top_k(state, ["survey_id"], "score", 1, tiebreak_col="sugg_id")
    return best.join(outlines.select("survey_id", "survey_title"), "survey_id") \
        .select("survey_id", "survey_title",
                F.col("new_outline_md").alias("outline_md"),
                F.col("score").alias("eval_score"))


def self_refine(best: DataFrame, client_factory, cfg: V2Config,
                retry: RetryPolicy | None = None) -> DataFrame:
    """refine_module.py:25-66: rounds × best_of L13→L11→L12 chains, keep max."""
    state = best
    for rnd in range(cfg.refine_rounds):
        chains = state.crossJoin(
            state.sparkSession.range(cfg.best_of).select(
                F.col("id").cast("int").alias("chain_id"))
        )
        sugg = llm_stage(
            chains,
            build_prompt=lambda r: (
                f"[SELF_REFINE] chain {r['chain_id']} round {rnd}\n"
                f"Survey title: {r['survey_title']}\n"
                f"Outline:\n```markdown\n{r['outline_md']}\n```\n"
                "Reply with a ```suggestion block."
            ),
            parse=_parse_suggestion,
            client_factory=client_factory,
            payload_fields=_payload("suggestion"),
            keep_cols=["survey_id", "survey_title", "outline_md", "chain_id"],
            retry=retry,
        ).filter("llm_ok").select(
            "survey_id", "survey_title", "outline_md",
            F.concat(F.lit(f"r{rnd}c"), F.col("chain_id").cast("string")).alias("sugg_id"),
            F.col("suggestion").alias("content"),
        )
        evald = _modify_and_eval(sugg, client_factory, retry)
        pool = evald.select(
            "survey_id", "survey_title",
            F.col("new_outline_md").alias("outline_md"),
            F.col("score").alias("eval_score"), F.col("sugg_id"),
        ).unionByName(state.withColumn("sugg_id", F.lit("keep")))
        state = prune_top_k(pool, ["survey_id"], "eval_score", 1,
                            tiebreak_col="sugg_id").drop("sugg_id") \
            .localCheckpoint(eager=True)
    return state


# ---------------------------------------------------------------------------
# decode: L14 orchestra → A6 assembly → P12/A7 → survey rows
# ---------------------------------------------------------------------------


def decode_survey(final_outline: DataFrame, digests: DataFrame, papers: DataFrame,
                  client_factory, cfg: V2Config,
                  retry: RetryPolicy | None = None) -> DataFrame:
    nodes = skeleton.parse_outlines(
        final_outline, title_col="survey_title", md_col="outline_md"
    ).localCheckpoint(eager=True)
    # leaf = node that is no one's parent (content.py:139-146: leaves seed
    # the ready queue)
    pp = nodes.filter(F.size("node_path") > 1).select(
        "survey_id",
        F.expr("slice(node_path, 1, size(node_path) - 1)").alias("node_path"),
    ).distinct()
    leaves = nodes.join(pp, ["survey_id", "node_path"], "left_anti")

    # digest material per (survey, pos)
    section_digests = (
        digests.withColumn("__d", F.struct(F.col("digest_id").alias("k"),
                                           F.col("description").alias("v")))
        .groupBy("survey_id", "pos")
        .agg(F.concat_ws("\n", F.transform(F.array_sort(F.collect_list("__d")),
                                           lambda s: s["v"])).alias("material"))
    )
    leaf_in = leaves.join(section_digests, ["survey_id", "pos"], "left") \
        .join(final_outline.select("survey_id", "survey_title"), "survey_id")
    contents = llm_stage(
        leaf_in.withColumn("material", F.coalesce("material", F.lit(""))),
        build_prompt=lambda r: (
            f"[ORCHESTRA] Survey title: {r['survey_title']}\n"
            f"Section title: {r['title']}\n"
            f"Digests:\n{r['material'][:3000]}\n"
            "Write the section prose, citing papers as [bibkey]."
        ),
        parse=lambda s: {"content": s},
        client_factory=client_factory,
        payload_fields=_payload("content"),
        keep_cols=["survey_id", "pos", "depth", "title"],
        retry=retry,
    ).filter("llm_ok").select("survey_id", "pos", "depth", "title", "content")

    # A6 level-synchronous bottom-up: parents summarize their children
    max_depth = nodes.agg(F.max("depth")).collect()[0][0] or 0
    done = contents
    for d in range(max_depth - 1, -1, -1):
        level_nodes = nodes.filter(F.col("depth") == d).join(
            done.select("survey_id", "pos").distinct(), ["survey_id", "pos"],
            "left_anti",
        )
        if level_nodes.isEmpty():
            continue
        children = nodes.filter(F.size("node_path") > 1).select(
            "survey_id", "pos",
            F.expr("slice(node_path, 1, size(node_path) - 1)").alias("parent_path"),
        ).join(done, ["survey_id", "pos"]) \
         .withColumnRenamed("pos", "child_pos")
        subcontent = (
            children.join(
                level_nodes.select("survey_id",
                                   F.col("node_path").alias("parent_path"),
                                   F.col("pos").alias("parent_pos"),
                                   F.col("title").alias("parent_title"),
                                   F.col("depth").alias("parent_depth")),
                ["survey_id", "parent_path"],
            )
            .withColumn("__c", F.struct(F.col("child_pos").alias("k"),
                                        F.col("content").alias("v")))
            .groupBy("survey_id", "parent_pos", "parent_title", "parent_depth")
            .agg(F.concat_ws("\n\n", F.transform(
                F.array_sort(F.collect_list("__c")), lambda s: s["v"])).alias("subcontents"))
        ).join(final_outline.select("survey_id", "survey_title"), "survey_id")
        parent_content = llm_stage(
            subcontent,
            build_prompt=lambda r: (
                f"[SUMMARY] Survey title: {r['survey_title']}\n"
                f"Section title: {r['parent_title']}\n"
                f"Subsections:\n{r['subcontents'][:3000]}\n"
                "Summarize into the parent section's lead prose."
            ),
            parse=lambda s: {"content": s},
            client_factory=client_factory,
            payload_fields=_payload("content"),
            keep_cols=["survey_id", "parent_pos", "parent_title", "parent_depth"],
            retry=retry,
        ).filter("llm_ok").select(
            "survey_id", F.col("parent_pos").alias("pos"),
            F.col("parent_depth").alias("depth"),
            F.col("parent_title").alias("title"), "content",
        )
        done = done.unionByName(parent_content).localCheckpoint(eager=True)

    if cfg.polish:
        done = llm_stage(
            done,
            build_prompt=lambda r: (
                f"[POLISH] Section title: {r['title']}\nDraft:\n{r['content']}"
            ),
            parse=lambda s: {"content": s},
            client_factory=client_factory,
            payload_fields=_payload("content"),
            keep_cols=["survey_id", "pos", "depth", "title"],
            retry=retry,
        ).filter("llm_ok").select("survey_id", "pos", "depth", "title", "content")

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
            .join(final_outline.select("survey_id", "survey_title"), "survey_id")
        )
        figs = generate_figures(draft_with_heads, client_factory, retry)
        done = anchor_figures(done, figs)

    # P12 renumber + A7 + references (decode_pipeline.py:115-156)
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
        .join(final_outline, "survey_id")
        .select("survey_id", "survey_title", "outline_md", "content_md",
                "ref_str", "cite_ratio", "n_papers", "n_sections", "eval_score")
    )


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------


def run_v2_survey(surveys: DataFrame, client_factory,
                  cfg: V2Config | None = None,
                  retry: RetryPolicy | None = None) -> DataFrame:
    """SURVEYS_INPUT rows → one output row per survey (S5 shape)."""
    cfg = cfg or V2Config()
    papers = build_papers(surveys).localCheckpoint(eager=True)
    grouped = group_papers(papers, cfg, client_factory, retry)
    outlines = init_outlines(grouped, client_factory, cfg, retry) \
        .localCheckpoint(eager=True)
    digests, _dead = make_digests(grouped, outlines, client_factory, cfg, retry)
    digests = digests.localCheckpoint(eager=True)
    suggestions = feedback_suggestions(digests, outlines, client_factory, retry)
    best = convolution_block(outlines, suggestions, client_factory, cfg, retry)
    refined = self_refine(best, client_factory, cfg, retry).localCheckpoint(eager=True)
    return decode_survey(refined, digests, papers, client_factory, cfg, retry)
