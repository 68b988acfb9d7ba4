"""Sequence packing: fill fixed-token training sequences from variable-
length documents (scale extension).

Trainers consume fixed-length sequences; feeding one short document per
sequence wastes the budget on padding.  Packing is bin-packing documents
into sequences of at most ``max_tokens`` — the standard pre-tokenization
step ("example packing" in T5/GPT data pipelines).

Distributed design: global first-fit-decreasing is inherently sequential,
but packing QUALITY doesn't need global order — documents are hashed into
``n_buckets`` independent buckets and packed per bucket with first-fit-
decreasing inside one ``applyInPandas`` group.  Waste stays within a few
percent of the sequential packer as long as each bucket holds ≫ 1
sequence worth of documents (law of large numbers on the length
distribution), and every bucket packs in parallel.

100 TB framing: one exchange on the 4-byte bucket id; per-bucket state is
O(bucket rows) ids + lengths (text itself can stay behind — pack on
(id, n_tokens) and join assignments back, which is what :func:`pack_assignments`
returns).  Bucket count scales with the corpus (rows / ~5k by default,
capped at 65 536 — pass n_buckets beyond ~330 M rows), keeping
groups executor-sized.

Determinism: bucket id = ``xxhash64(id) % n_buckets``; within a bucket,
documents are packed in (length desc, id) order — reproducible under any
input partitioning.

Gates: invariants (every doc assigned exactly once, no sequence over
budget, oversized docs isolated + flagged), determinism, and a packing-
efficiency bound vs the ideal — tests/test_packing.py.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd  # module-level: pandas_udf type-hint resolution needs
                     # pd.Series in module globals under postponed annotations
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# per-executor encoder cache for string tokenizer specs — the encoder is
# built lazily at first batch on each worker (BPE tables are MBs; they
# must not travel in the task closure, and the driver may not even have
# the library installed when only executors do the counting)
_ENCODER_CACHE: dict = {}


def _encoder_for(spec: str) -> Callable[[str], list]:
    enc = _ENCODER_CACHE.get(spec)
    if enc is None:
        kind, _, name = spec.partition(":")
        if kind == "tiktoken":
            import tiktoken  # gated: raises ImportError where absent

            enc = tiktoken.get_encoding(name).encode
        elif kind == "hf":
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(name)
            enc = lambda s: tok(s)["input_ids"]  # noqa: E731
        elif kind == "minibpe":
            # vendored dependency-free BPE (functions/minibpe.py): the
            # same lazily-built-per-executor contract as tiktoken/hf,
            # loadable in containers that have neither — `name` is the
            # merges-file path, which every executor must see (fixture
            # under tests/, or a shared filesystem in a real deployment)
            from llmxmapreduce_spark.functions.minibpe import (MiniBPE,
                                                               load_merges)

            enc = MiniBPE(load_merges(name)).encode
        else:
            raise ValueError(
                f"unknown tokenizer spec {spec!r} — expected "
                f"'tiktoken:<encoding>', 'hf:<model>', or "
                f"'minibpe:<merges-file>'")
        _ENCODER_CACHE[spec] = enc
    return enc


def resolve_token_counter(tokenizer) -> Callable[[Column], Column]:
    """Resolve a tokenizer spec to a ``Column -> Column`` token-count
    function, so packing's ``n_tokens`` can be BPE-accurate instead of
    whitespace-approximate (the reference's V1 chunker budgets are
    tokenizer-accurate for the same reason — Generator.py:301-318).

    Accepted specs, fastest first:

    - ``None`` — whitespace word count (the historical default; pure
      Catalyst, zero Python);
    - a ``Column -> Column`` callable (e.g. ``functions.text.
      token_count_bpe_ish`` / ``token_count_estimate``) — used as-is,
      stays JVM-side;
    - ``"tiktoken:<encoding>"`` / ``"hf:<model>"`` — an Arrow-batched
      pandas UDF whose encoder is built lazily PER EXECUTOR and cached
      (import-gated: the error surfaces at first batch if the library
      isn't installed);
    - any other Python callable ``str -> int`` — wrapped in a pandas
      UDF, null → 0.  Must be cloudpickle-shippable to workers: locally
      defined functions serialize by value; a function at the top level
      of a module serializes by REFERENCE and the module must then be
      importable on every executor.

    Every path is null-safe (null text counts 0 tokens — a negative
    count would inflate bin capacities, which ``ffd_pack`` hard-rejects).
    """
    from pyspark.sql.functions import pandas_udf

    if tokenizer is None:
        return lambda c: F.greatest(
            F.size(F.split(F.trim(c), r"\s+")), F.lit(0)).cast("long")

    if isinstance(tokenizer, str):
        spec = tokenizer

        @pandas_udf("long")
        def count_spec(s: pd.Series) -> pd.Series:
            enc = _encoder_for(spec)
            return s.map(lambda t: 0 if t is None else len(enc(t)))

        return lambda c: count_spec(c)

    if callable(tokenizer):
        try:  # Column-fn? (duck test — e.g. token_count_bpe_ish)
            probe = tokenizer(F.lit("probe"))
            if isinstance(probe, Column):
                return lambda c: F.greatest(
                    tokenizer(c).cast("long"), F.lit(0))
        except Exception:
            pass
        py_fn = tokenizer

        @pandas_udf("long")
        def count_py(s: pd.Series) -> pd.Series:
            return s.map(lambda t: 0 if t is None else int(py_fn(t)))

        return lambda c: count_py(c)

    raise TypeError(f"unsupported tokenizer: {tokenizer!r}")


def ffd_pack(rows, max_tokens: int):
    """Pure first-fit-decreasing core (property-tested directly):
    ``rows`` = iterable of (id, length) → list of (id, length, bin_index,
    truncated), packed in (length desc, id) order.  Oversized rows get a
    dedicated, already-full bin with ``truncated=True``."""
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    if ordered and ordered[-1][1] < 0:
        bad = next(r for r in ordered if r[1] < 0)
        raise ValueError(
            f"ffd_pack: negative length {bad[1]} for id {bad[0]!r} — a "
            f"negative ln would INCREASE bin capacity and overfill the "
            f"budget (null text upstream? size(split(null)) is -1)")
    # remaining capacity per bin; -1 marks a truncated (oversized) bin so
    # not even zero-length rows can join it
    bins: list[int] = []
    out = []
    for _id, ln in ordered:
        if ln > max_tokens:
            bins.append(-1)
            out.append((_id, ln, len(bins) - 1, True))
            continue
        for b, cap in enumerate(bins):
            if cap >= ln:
                bins[b] = cap - ln
                out.append((_id, ln, b, False))
                break
        else:
            bins.append(max_tokens - ln)
            out.append((_id, ln, len(bins) - 1, False))
    return out


def pack_assignments(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    n_buckets: int | None = None,
) -> DataFrame:
    """→ (id_col, len_col, seq_id, truncated) — which training sequence
    each document lands in.

    ``seq_id`` is globally unique (``bucket * 2^40 + local index``).
    A document longer than ``max_tokens`` gets a sequence of its own with
    ``truncated = true`` (the caller decides whether to split or drop it
    — packing never silently loses tokens).

    ``n_buckets=None`` sizes buckets from a count (one cheap job):
    ~5 000 docs per bucket, so small corpora pack in ONE bucket (bucketed
    FFD ≈ sequential FFD) while large corpora fan out — a bucket holding
    ≪ 1 sequence worth of docs would waste nearly its whole budget, and a
    bucket holding too many makes the per-group Python FFD (O(docs×bins))
    the bottleneck.  The 65 536-bucket cap covers ~330 M docs; past that,
    pass ``n_buckets`` explicitly (the guidance in the module docstring).
    Callers that know their row count pass it explicitly to skip the
    count job."""
    import pandas as pd

    if max_tokens <= 0:
        raise ValueError("pack_assignments: max_tokens must be positive")
    if n_buckets is None:
        n_buckets = max(1, min(65_536, df.count() // 5_000))
    id_t = dict(df.dtypes)[id_col]
    schema = (f"{id_col} {id_t}, {len_col} bigint, seq_id bigint, "
              f"truncated boolean")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["__bucket"].iloc[0])
        # duplicate ids always hash to the SAME bucket, so this per-bucket
        # check is a complete guard: with dup ids the text join in
        # pack_sequences would cross-product and silently overfill bins
        # (e.g. mix_sources epoch-upsampled output packed on doc_id alone)
        if not pdf[id_col].is_unique:
            dup = pdf[id_col][pdf[id_col].duplicated()].iloc[0]
            raise ValueError(
                f"pack_assignments: duplicate {id_col}={dup!r} — ids must "
                f"be unique; for epoch-upsampled rows derive a composite "
                f"key first (e.g. xxhash64({id_col}, epoch))")
        packed = ffd_pack(zip(pdf[id_col], pdf[len_col].astype(int)),
                          max_tokens)
        return pd.DataFrame({
            id_col: [p[0] for p in packed],
            len_col: [p[1] for p in packed],
            "seq_id": [(bucket << 40) + p[2] for p in packed],
            "truncated": [p[3] for p in packed],
        })

    bucketed = df.select(id_col, len_col).withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)))
    return bucketed.groupBy("__bucket").applyInPandas(pack, schema)


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str | None = None,
    n_buckets: int | None = None,
    sep: str = "\n\n",
    tokenizer=None,
) -> DataFrame:
    """Materialized variant: → (seq_id, n_docs, total_tokens, truncated,
    text) with documents concatenated per sequence in (length desc, id)
    pack order.  When ``len_col`` is None, lengths are computed on the
    fly by ``tokenizer`` (see :func:`resolve_token_counter`: None =
    whitespace words; a Column-fn, ``"tiktoken:<enc>"``/``"hf:<model>"``,
    or a picklable ``str -> int`` = BPE-accurate counts — real trainers
    pack BPE tokens, and whitespace counts understate them by the
    subword-split factor).  ``tokenizer`` is ignored when ``len_col``
    provides precomputed lengths.

    The heavy text column joins the assignment table on ``id_col`` — an
    equi-join — and is re-aggregated per ``seq_id``; at very large scale
    prefer :func:`pack_assignments` + a writer that streams documents by
    assignment instead of building sequence strings in the shuffle."""
    src = df
    if len_col is None:
        len_col = "n_tokens"
        # every counter path is null-safe → ≥ 0 (size(split(null)) is -1,
        # which would corrupt bin capacities — ffd_pack also hard-raises
        # on negatives)
        src = df.withColumn(
            len_col, resolve_token_counter(tokenizer)(F.col(text_col)))
    asg = pack_assignments(src, max_tokens, id_col, len_col, n_buckets)
    joined = asg.join(src.select(id_col, text_col), id_col)
    return (
        joined.withColumn("__s", F.struct(
            (-F.col(len_col)).alias("k1"), F.col(id_col).alias("k2"),
            F.col(text_col).alias("v")))
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(len_col).alias("total_tokens"),
            F.max("truncated").alias("truncated"),
            F.concat_ws(sep, F.transform(
                F.array_sort(F.collect_list("__s")), lambda s: s["v"]))
            .alias("text"),
        )
    )
