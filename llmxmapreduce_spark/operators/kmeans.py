"""Distributed Lloyd k-means over embedding columns — the full-corpus
refinement stage behind IVF cells (operators/ivf.py) and SemDeDup
clustering.

``ivf.fit_centroids`` initializes centroids from a BOUNDED driver-side
sample (k-means++-flavoured); that is the right INIT at any scale, but a
sample-only fit leaves centroid quality at the mercy of the sample.
This module runs true Lloyd iterations over the WHOLE corpus: each
iteration is

    one projected scan of the vector column
      → map-side assignment against broadcast centroids (argmin ‖x−c‖²)
      → per-batch partial sums (≤ K rows per Arrow batch, K·D ints each)
      → one (cell, pos) aggregation whose result is K·D rows

so per-iteration shuffle state is K·D longs — independent of corpus
size.  MLlib's KMeans has the same shape via treeAggregate on RDDs;
this is the DataFrame/Arrow formulation, with one deliberate
difference:

**Determinism contract.**  Coordinates are quantized to a 1e-6 grid
(``round half away from zero``, matching Spark ``F.round`` and DuckDB
``round``) and ALL arithmetic after that is exact int64: squared
distances, partial sums, counts.  Integer sums are reduction-order
independent, so the fit is bit-identical run-to-run regardless of
partitioning — unlike float partial sums, which make standard k-means
nondeterministic under Spark's nondeterministic reduce order.  The
centroid update re-quantizes the mean onto the same grid with pure IEEE
ops (``floor((2·S + C)/(2·C))`` in float64 = round-half-up of S/C;
S, C < 2^53 so every step is correctly rounded and engine-identical),
which makes even the ITERATION DuckDB-expressible — the `kmeans_lloyd`
oracle replays assignment → update → assignment in SQL and matches
value-for-value.

Quantization error moves each coordinate by ≤ 0.5e-6 — far inside the
cluster-scale structure k-means can resolve; the payoff is a correctness
gate that can hash-compare an iterative fit across engines.

Overflow guard: with scale s, ‖x‖∞·s must stay ≤ 1e9 so that
D·(2·max)² < 2^63 holds for D up to ~2000.  The assignment UDF checks
per batch and raises rather than wrap.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quantize_np",
    "kmeans_assign",
    "kmeans_refine",
]

_MAX_ABS_Q = 1_000_000_000  # see module overflow guard


def quantize_np(x: np.ndarray, scale: float = 1e6) -> np.ndarray:
    """Round-half-away-from-zero onto the 1/scale grid → int64.
    Matches Spark ``F.round(col*scale)`` and DuckDB ``round(x*scale, 0)``
    (both half-away); numpy's own ``np.round`` is half-EVEN and must not
    be used here."""
    x = np.asarray(x, dtype=np.float64) * scale
    return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)


def _check_bounds(xq: np.ndarray) -> None:
    if xq.size and np.abs(xq).max() > _MAX_ABS_Q:
        raise ValueError(
            "kmeans: quantized coordinate exceeds 1e9 — lower `scale` "
            "(overflow guard for exact int64 distance arithmetic)"
        )


def _argmin_cells(xq: np.ndarray, cq: np.ndarray):
    """Exact int64 argmin of ‖x−c‖² per row; ties → lowest cell index
    (np.argmin takes the first minimum).  Returns (cell idx, d2)."""
    x2 = np.einsum("ij,ij->i", xq, xq)
    c2 = np.einsum("ij,ij->i", cq, cq)
    d2 = x2[:, None] - 2 * (xq @ cq.T) + c2[None, :]
    cell = np.argmin(d2, axis=1)
    return cell, d2[np.arange(len(cell)), cell]


def kmeans_assign(
    df: DataFrame,
    centroids_q: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: float = 1e6,
) -> DataFrame:
    """→ ``(id_col, cell INT, d2_q BIGINT)`` — nearest centroid per row
    under exact quantized-int64 squared distance.  Map-side only: the
    centroid matrix rides the closure (K·D longs), nothing shuffles."""
    cq = np.ascontiguousarray(centroids_q, dtype=np.int64)
    _check_bounds(cq)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            xq = quantize_np(np.stack(pdf[vec_col].to_numpy()), scale)
            _check_bounds(xq)
            cell, d2 = _argmin_cells(xq, cq)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cell": cell.astype(np.int32),
                    "d2_q": d2,
                }
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, cell int, d2_q long"
    )


def _partial_sums(
    df: DataFrame,
    centroids_q: np.ndarray,
    vec_col: str,
    scale: float,
) -> DataFrame:
    """Per-Arrow-batch partial (cell, count, Σ vec) rows — ≤ K rows per
    batch, so the shuffle into the (cell, pos) aggregation carries
    batches·K·D longs, not corpus·D."""
    cq = np.ascontiguousarray(centroids_q, dtype=np.int64)
    k, d = cq.shape

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            xq = quantize_np(np.stack(pdf[vec_col].to_numpy()), scale)
            _check_bounds(xq)
            cell, _ = _argmin_cells(xq, cq)
            cells, inv = np.unique(cell, return_inverse=True)
            sums = np.zeros((len(cells), d), dtype=np.int64)
            np.add.at(sums, inv, xq)
            cnt = np.bincount(inv, minlength=len(cells)).astype(np.int64)
            yield pd.DataFrame(
                {
                    "cell": cells.astype(np.int32),
                    "cnt": cnt,
                    "sums": list(sums),
                }
            )

    return df.select(vec_col).mapInPandas(
        run, schema="cell int, cnt long, sums array<long>"
    )


def kmeans_refine(
    df: DataFrame,
    centroids_q: np.ndarray,
    n_iter: int = 5,
    vec_col: str = "embedding",
    scale: float = 1e6,
) -> np.ndarray:
    """``n_iter`` full-corpus Lloyd updates starting from
    ``centroids_q`` (int64, quantized — e.g. ``quantize_np`` of an
    ``ivf.fit_centroids`` result).  Returns the refined quantized
    centroid matrix; empty cells keep their previous centroid (the
    MLlib convention — resampling a replacement would break the
    cross-engine determinism contract).

    Driver state per iteration is the K·D aggregated sum table — the
    same bounded collect every scalable k-means makes (MLlib
    treeAggregate does K·D doubles); corpus size never enters it."""
    cq = np.array(centroids_q, dtype=np.int64, copy=True)
    k, d = cq.shape
    for _ in range(n_iter):
        rows = (
            _partial_sums(df, cq, vec_col, scale)
            .select(
                "cell",
                "cnt",
                F.posexplode("sums").alias("pos", "val"),
            )
            .groupBy("cell", "pos")
            .agg(F.sum("cnt").alias("c"), F.sum("val").alias("s"))
            .collect()
        )
        # each batch contributes its cnt once per pos, so the summed `c`
        # is the cell's total row count — identical across pos
        cnt = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, d), dtype=np.int64)
        for r in rows:
            sums[r["cell"], r["pos"]] = r["s"]
            cnt[r["cell"]] = r["c"]
        nz = cnt > 0
        # round-half-up of S/C on the grid, in pure IEEE float64 —
        # engine-identical (see module docstring)
        upd = np.floor(
            (2.0 * sums[nz] + cnt[nz, None]) / (2.0 * cnt[nz, None])
        ).astype(np.int64)
        cq[nz] = upd
    return cq
