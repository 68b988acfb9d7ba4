"""Grouping / batching operators C6-C7 (SURVEY.md §2.4).

Reference: skeleton_init_module.py:25-32 (C6 shuffled fixed batches),
group_module.py:47-53 (random grouping), :62-116 (``regroup_result`` — the
LLM-group repair pass).

Determinism: the reference uses unseeded ``random.shuffle``; here "shuffle"
means ordering by a keyed hash (md5 of key + seed) — reproducible across
runs AND engines (FIXTURES.md rule 1), and partition-independent, unlike
``rand(seed)`` whose draw depends on row partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_shuffled_batches(
    df: DataFrame,
    key_col: str,
    batch_size: int,
    seed: int = 42,
    partition_cols: list[str] | None = None,
    group_col: str = "group_id",
) -> DataFrame:
    """C6/C7-random: pseudo-shuffle rows by md5(key||seed) then cut into
    fixed-size batches per partition group: group_id = floor(rank/size)."""
    order = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}")))
    w = Window.partitionBy(*(partition_cols or [])).orderBy(order, F.col(key_col))
    return df.withColumn(
        group_col, F.floor((F.row_number().over(w) - 1) / batch_size).cast("int")
    )


def regroup_result_py(result: list[list[str]], rest_bibkeys: list[str],
                      batch_size: int) -> list[list[str]]:
    """group_module.py:62-100 ``regroup_result`` port: split oversize groups,
    greedily combine small ones, backfill from leftovers, batch the rest.

    The reference pops from an (unordered) set and shuffles unseeded; this
    port takes ``rest_bibkeys`` as an ordered list and 'shuffles' by sorted
    md5 — same repair semantics, reproducible output.
    """
    import hashlib

    final_result: list[list[str]] = []
    remaining_groups: list[list[str]] = []
    for group in result:
        group = list(group)
        while len(group) >= batch_size:
            final_result.append(group[:batch_size])
            group = group[batch_size:]
        if group:
            remaining_groups.append(group)

    remaining_groups.sort(key=len, reverse=True)

    combined_groups: list[list[str]] = []
    while remaining_groups:
        group1 = remaining_groups.pop(0)
        for i in range(1, len(remaining_groups) - 1):
            group2 = remaining_groups[i]
            if len(group1) + len(group2) <= batch_size:
                final_result.append(group1 + group2)
                remaining_groups.pop(i)
                break
        else:
            combined_groups.append(group1)

    rest = list(rest_bibkeys)
    for group in combined_groups:
        while len(group) < batch_size and rest:
            group.append(rest.pop())
        final_result.append(group)

    rest.sort(key=lambda k: hashlib.md5(f"{k}#42".encode()).hexdigest())
    for i in range(0, len(rest), batch_size):
        final_result.append(rest[i:i + batch_size])
    return final_result
