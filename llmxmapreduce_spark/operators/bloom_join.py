"""Bloom-pruned joins: cut the shuffle before it happens.

At 100 TB the expensive part of ``fact ⋈ dim`` is shuffling fact rows
that will never match.  When the interesting dim-key set is too big to
broadcast as an exact set but its BLOOM fits comfortably (12 bits/key
= 1.5 MB per million keys), the classic move — what engines call a
runtime filter / sideways information passing — is: build a Bloom
filter of the dim keys, filter the fact side with it BEFORE the join,
then run the exact join to kill the false positives.  Spark's own
bloom runtime filter (`spark.sql.optimizer.runtime.bloomFilter.*`)
only fires for plans Catalyst chooses; this operator makes the
technique explicit and composable.

Spark-first detail — the probe is TWO-TIER, auto-selected by bitmap
size (both tiers keep the filter glued to the fact scan, below the
join, so no optimizer rule reorders work underneath it):

- small bitmaps (≤ 2 MiB): PURE CATALYST — the bitmap rides a SCALAR
  SUBQUERY (``DataFrame.scalar()``) and each of the k probe positions
  is a ``shiftrightunsigned(element_at(...)) & 1`` codegen bit test.
  Zero Python.  The scalar literal is embedded per-task, which is why
  this tier is size-capped.
- large bitmaps: ONE ``sc.broadcast`` (TorrentBroadcast — shipped once
  per executor, not per task) probed by an Arrow-vectorized pandas_udf
  over the JVM-computed xxhash64 column; numpy does the k bit tests
  per batch.

THREE rejected formulations, all measured live: an ``F.lit(list)``
literal expands to a CreateArray with one child node PER WORD and
melts plan compilation at sf1 (334 s → timeout); a one-row crossJoin
carries the bitmap as data but ``PushDownLeftSemiAntiJoin`` pushes the
exact semi join BELOW the bitmap filter — join first, prune after, the
inversion of the operator's purpose; and the scalar subquery alone,
which is perfect until the per-task literal embedding breaks task
serialization at sf5 bitmap sizes ("IllegalStateException: unread
block data" at ~960k words).  The BUILD is
one projected xxhash64 scan → per-partition numpy bitmaps → driver OR
(same shape as decontamination's gram bloom; the driver holds
m/8 bytes, bounded by construction).  Build and probe share the
Kirsch-Mitzelmacher double-hash layout — h1 = h >>> 32,
h2 = h & 0xFFFFFFFF, pos_i = (h1 + i·h2) mod m — written identically
in numpy (uint64) and Catalyst (nonneg longs; no overflow below
m ≤ 2^32), pinned equal by test.

Guarantees: NO false negatives (every matching row survives the
prune), so ``bloom_semi_join`` ≡ a plain LEFT SEMI join — the values
oracle.  False positives only waste work, and the exact join removes
them.

Null keys: xxhash64 hashes null deterministically (it never returns
null), so null-key rows flow through the prune like any other value —
harmless, because the exact join's equi-semantics reject them, and
the ≡-semi-join invariant is what callers rely on.  Use ``bloom_prune``
alone only where a null-key superset is acceptable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _key_hash(keys: list[str]) -> Column:
    cols = [F.col(k) for k in keys]
    return F.xxhash64(*cols)


def build_key_bloom(
    df: DataFrame,
    on: str | list[str],
    bits_per_key: int = 12,
    n_items: int | None = None,
) -> tuple[list[int], int, int]:
    """Bloom of the DISTINCT key set of ``df`` → (words, m, k): words
    is the bitmap as signed int64 little-endian-bit words (the literal
    the probe embeds), m the bit count (multiple of 64), k the probe
    count (≈ 0.7·bits_per_key, the optimal for the target fpp).

    ``n_items`` — expected distinct keys; one approx_count_distinct
    aggregate when omitted."""
    import numpy as np

    keys = [on] if isinstance(on, str) else list(on)
    hashes = df.select(_key_hash(keys).alias("__h"))
    if n_items is None:
        n_items = hashes.agg(
            F.approx_count_distinct("__h")).collect()[0][0] or 1
    m = max(64, ((int(n_items) * int(bits_per_key) + 63) // 64) * 64)
    if m > (1 << 32):
        raise ValueError("build_key_bloom: m > 2^32 — the Catalyst "
                         "probe's overflow-free arithmetic bound; "
                         "lower bits_per_key or pre-partition the key "
                         "space")
    k = max(1, int(round(0.7 * bits_per_key)))

    n_words = m // 64

    def set_bits(batches):
        import pandas as pd

        acc = np.zeros(n_words, dtype=np.uint64)
        for pdf in batches:
            h = pdf["__h"].to_numpy(dtype=np.int64).view(np.uint64)
            h1, h2 = h >> np.uint64(32), h & np.uint64(0xFFFFFFFF)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
                np.bitwise_or.at(
                    acc, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)))
        yield pd.DataFrame({"w": [acc.tobytes()]})

    rows = hashes.mapInPandas(set_bits, "w binary").collect()
    acc = np.zeros(n_words, dtype=np.uint64)
    for r in rows:
        acc |= np.frombuffer(r["w"], dtype=np.uint64)
    words = [int(x) for x in acc.view(np.int64)]
    return words, m, k


# Above this many WORDS the bitmap rides an sc.broadcast + Arrow probe:
# a scalar-subquery literal re-embeds the whole array into EVERY task
# binary (boxed, Java-serialized), which is wasteful at any size and
# broke outright at sf5 (~960k words ⇒ "IllegalStateException: unread
# block data" in ShuffleMapTask deserialization).  2^18 words = 2 MiB.
_CATALYST_PROBE_MAX_WORDS = 1 << 18


def bloom_prune(
    df: DataFrame,
    on: str | list[str],
    bloom: tuple[list[int], int, int],
    probe: str = "auto",
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the bloom (a superset of
    the true matches).

    ``probe="catalyst"`` — bitmap as a scalar subquery + k codegen
    shift/AND bit tests; zero Python, filter pinned to the input scan.
    Right for small bitmaps; the literal is embedded per-task, so past
    a couple of MiB it wastes task bytes and eventually breaks task
    serialization (see _CATALYST_PROBE_MAX_WORDS).

    ``probe="arrow"`` — bitmap as ONE sc.broadcast (TorrentBroadcast:
    shipped once per executor, not per task) probed by an
    Arrow-vectorized pandas_udf over the JVM-computed xxhash64 column —
    numpy does the k bit tests per batch.  The scale path.

    ``probe="auto"`` picks by bitmap size.  Both probes are test-pinned
    to identical results."""
    words, m, k = bloom
    keys = [on] if isinstance(on, str) else list(on)
    if probe == "auto":
        probe = "catalyst" if len(words) <= _CATALYST_PROBE_MAX_WORDS \
            else "arrow"
    h = _key_hash(keys)
    if probe == "arrow":
        return df.filter(_arrow_probe(df, words, m, k)(h))
    if probe != "catalyst":
        raise ValueError(f"bloom_prune: unknown probe {probe!r}")
    spark = df.sparkSession
    arr = spark.createDataFrame([(words,)],
                                "__bloom array<bigint>").scalar()
    h1 = F.shiftrightunsigned(h, 32)
    h2 = h.bitwiseAND(F.lit(0xFFFFFFFF))
    cond = F.lit(True)
    for i in range(k):
        pos = (h1 + F.lit(i) * h2) % F.lit(m)
        word = F.element_at(arr, (pos / F.lit(64)).cast("int") + F.lit(1))
        # the PySpark shift wrappers take only literal amounts; the SQL
        # function itself shifts by a column
        bit = F.call_function(
            "shiftrightunsigned", word, (pos % F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1))
        cond = cond & (bit == F.lit(1))
    return df.filter(cond)


def _arrow_probe(df: DataFrame, words: list[int], m: int, k: int):
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    bits = np.array(words, dtype=np.int64).view(np.uint64)
    bc = df.sparkSession.sparkContext.broadcast(bits)

    @pandas_udf("boolean")
    def might_contain(h: pd.Series) -> pd.Series:
        arr = bc.value
        hv = h.to_numpy(dtype=np.int64).view(np.uint64)
        h1, h2 = hv >> np.uint64(32), hv & np.uint64(0xFFFFFFFF)
        ok = np.ones(len(hv), dtype=bool)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
            w = arr[(pos >> np.uint64(6)).astype(np.int64)]
            ok &= ((w >> (pos & np.uint64(63)))
                   & np.uint64(1)).astype(bool)
        return pd.Series(ok)

    return might_contain


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    bits_per_key: int = 12,
) -> DataFrame:
    """left ⋉ right with the shuffle cut first: bloom-prune left by
    right's key set, then the exact LEFT SEMI join.  Result ≡ the plain
    semi join (no false negatives; the join kills false positives) —
    that identity IS the values oracle."""
    keys = [on] if isinstance(on, str) else list(on)
    bloom = build_key_bloom(right, keys, bits_per_key=bits_per_key)
    pruned = bloom_prune(left, keys, bloom)
    return pruned.join(right.select(*keys).distinct(), keys, "left_semi")
