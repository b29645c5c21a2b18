"""Deterministic distributed Lloyd training for the coarse quantizer
and the PQ codebooks (k-means, Lloyd 1982; the IVFADC training recipe
of Jégou et al. 2011 §IV — train the coarse quantizer on the corpus,
then the product codebooks on the residuals).

Why this exists: the sampled stand-in quantizers were bit-reproducible
in the DuckDB oracle but left recall on the table — the round-9 nprobe
curve hash-pinned cell COVERAGE (how often a true neighbor's cell is
probed at all) as the binding constraint, and coverage is exactly what
Lloyd-refined centroids buy (cells shaped like the data instead of
like 16 arbitrary corpus vectors).

Cross-engine exactness strategy — FIXED-POINT INTEGER SUMS. The Lloyd
mean is the one step a naive port cannot reproduce across engines:
summing doubles is order-dependent, and neither Spark's partial
aggregation nor DuckDB's defines a fold order. Instead of forcing an
ordered fold (a per-group collect_list sort — unbounded group state,
wrong at scale), every coordinate is quantized half-away-from-zero to
a 2^20 fixed-point BIGINT and the cluster sums run over exact
integers: associative, commutative, shuffle-order-independent, and
identical in Spark (`sum(long)`) and DuckDB (`sum(BIGINT)`). The new
centroid coordinate is then ONE double division of exact integers —
`sum / (n · 2^20)` — which IEEE 754 rounds identically everywhere. No
lossy rounding is applied to the centroid itself; the established 9dp
rounding on cosines/distances (ivf.py conventions) absorbs the
remaining GEMM-vs-list_sum ulp noise exactly as it does for the
sampled quantizers. Quantizing the TRAINING inputs to 2^-20 granularity
perturbs the learned centroids by ~1e-6 — irrelevant to quality, and
both engines see the identical perturbation.

Scale shape (the reason for mapInPandas partials): each Lloyd round is
ONE corpus-linear Arrow pass that emits per-(partition, cluster)
partial integer sums — bounded rows (#batches × k), pre-reduced before
any shuffle — followed by an exact integer groupBy over those bounded
partials and a bounded driver-side collect (k × dim rows). At 100 TB
that is the canonical distributed k-means step: no corpus shuffle, no
unbounded group state, rounds × one-scan cost. Empty clusters keep
their previous centroid (the usual k-means convention, mirrored by a
LEFT JOIN + coalesce in the oracle CTEs).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP_SCALE = 1048576.0  # 2^20: exact in double; 64-dim sums stay << 2^53

#: Lloyd rounds for the coarse quantizer / the PQ codebooks. Two
#: rounds capture most of the k-means gain at these cell counts (the
#: measured coverage/recall deltas live in SURVEY §8); every extra
#: round costs one corpus pass AND one unrolled CTE block in every
#: consuming oracle, so the default stays small and explicit.
COARSE_ROUNDS = 2
BOOK_ROUNDS = 2


def _fixed_point(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero fixed-point quantization to int64 —
    bitwise `CAST(round(x * 1048576.0, 0) AS BIGINT)` in DuckDB."""
    xq = x * FP_SCALE
    return (np.sign(xq) * np.floor(np.abs(xq) + 0.5)).astype(np.int64)


def lloyd_coarse_centroids(
    emb: DataFrame, seed: list, rounds: int = COARSE_ROUNDS
) -> list:
    """Lloyd-refine `seed` (list of dim-length float lists) against the
    (vec_id, embedding) corpus: cosine argmax assignment (the ivf.py
    9dp/ties-to-smallest convention), fixed-point mean update."""
    from data_framework_spark.similarity.ivf import _rounded_centroid_cosines

    cents = [list(map(float, c)) for c in seed]
    ncells, dim = len(cents), len(cents[0])
    for _ in range(rounds):
        cos_matrix = _rounded_centroid_cosines(cents)

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                cells = cos_matrix(pdf["embedding"]).argmax(axis=1)
                XI = _fixed_point(X)
                out_c, out_s = [], []
                for c in np.unique(cells):
                    m = cells == c
                    out_c.append(int(c))
                    # payload = dim integer sums + the member count in
                    # the last slot: one aggregate, no separate count job
                    out_s.append(XI[m].sum(axis=0).tolist() + [int(m.sum())])
                yield pd.DataFrame({"cell": out_c, "s": out_s})

        # widen past the one-row-group test scan (no-op at scale);
        # the partials are FIXED-POINT INTEGER sums, so the partition
        # layout cannot change a single bit of the trained centroids
        from data_framework_spark.sources.tables import widen_scan

        parts = widen_scan(emb.select("embedding")).mapInPandas(
            gen, schema="cell int, s array<long>"
        )
        rows = (
            parts.select("cell", F.posexplode("s").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("sv"))
            .collect()
        )
        sums: dict[tuple[int, int], int] = {}
        counts: dict[int, int] = {}
        for r in rows:
            if r["pos"] == dim:
                counts[r["cell"]] = int(r["sv"])
            else:
                sums[(r["cell"], r["pos"])] = int(r["sv"])
        cents = [
            [
                sums[(c, p)] / (counts[c] * FP_SCALE)  # exact-int division
                for p in range(dim)
            ]
            if counts.get(c)
            else cents[c]
            for c in range(ncells)
        ]
    return cents


def lloyd_subspace_books(
    df: DataFrame, vec_col: str, books: np.ndarray, rounds: int = BOOK_ROUNDS
) -> np.ndarray:
    """Lloyd-refine per-subspace codebooks (M, K, SUB) against the
    vectors in `df[vec_col]`: 9dp-rounded squared-L2 argmin assignment
    (the pq.assign_pq_codes convention, sequential fold), fixed-point
    mean update per (subspace, code)."""
    from data_framework_spark.similarity.pq import _round9

    books = np.asarray(books, dtype=np.float64).copy()
    M, K, SUB = books.shape
    for _ in range(rounds):
        B = books.copy()

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                XI = _fixed_point(X)
                out_s, out_k, out_p = [], [], []
                for s in range(M):
                    Xs = X[:, s * SUB : (s + 1) * SUB]
                    diff = Xs[:, None, :] - B[s][None, :, :]
                    sq = diff * diff
                    acc = sq[:, :, 0]
                    for j in range(1, SUB):  # sequential fold, oracle order
                        acc = acc + sq[:, :, j]
                    code = np.argmin(_round9(acc), axis=1)
                    XIs = XI[:, s * SUB : (s + 1) * SUB]
                    for k in np.unique(code):
                        m = code == k
                        out_s.append(s)
                        out_k.append(int(k))
                        out_p.append(
                            XIs[m].sum(axis=0).tolist() + [int(m.sum())]
                        )
                yield pd.DataFrame(
                    {"subspace": out_s, "code": out_k, "s": out_p}
                )

        # widen for the same reason as lloyd_coarse_centroids above:
        # integer-sum partials, bitwise layout-independent
        from data_framework_spark.sources.tables import widen_scan

        parts = widen_scan(df.select(vec_col)).mapInPandas(
            gen, schema="subspace int, code int, s array<long>"
        )
        rows = (
            parts.select("subspace", "code", F.posexplode("s").alias("pos", "v"))
            .groupBy("subspace", "code", "pos")
            .agg(F.sum("v").alias("sv"))
            .collect()
        )
        sums: dict[tuple[int, int, int], int] = {}
        counts: dict[tuple[int, int], int] = {}
        for r in rows:
            if r["pos"] == SUB:
                counts[(r["subspace"], r["code"])] = int(r["sv"])
            else:
                sums[(r["subspace"], r["code"], r["pos"])] = int(r["sv"])
        new = books.copy()
        for s in range(M):
            for k in range(K):
                n = counts.get((s, k))
                if n:
                    new[s, k] = [
                        sums[(s, k, p)] / (n * FP_SCALE) for p in range(SUB)
                    ]
        books = new
    return books


# --- DuckDB oracle CTE builders (the same training, unrolled) ---------------


def lloyd_cents_cte(
    ncells: int,
    rounds: int = COARSE_ROUNDS,
    dim: int = 64,
    rel: str = "embeddings",
    out: str = "cent",
    prefix: str = "tc",
) -> str:
    """CTE chain deriving the Lloyd-trained coarse quantizer from
    scratch in SQL, ending in `{out} (cid, embedding, cn)` — the
    drop-in for the sampled `cent` CTE the IVFPQ oracles used. Assumes
    an `nrm (vec_id, embedding, n)` CTE is already defined. Each round
    is the exact mirror of one lloyd_coarse_centroids round: 9dp
    rounded-cosine argmax (ties to smallest cid), fixed-point BIGINT
    sums, one double division, empty cells keep their centroid."""
    fp = f"{FP_SCALE:.1f}"
    ctes = [
        f"""{prefix}0 AS (
  SELECT vec_id::INTEGER AS cid,
         list_transform(embedding, x -> x::DOUBLE) AS cent
  FROM {rel} WHERE vec_id < {ncells}
)"""
    ]
    for r in range(1, rounds + 1):
        p = f"{prefix}{r - 1}"
        dot = (
            f"list_sum(list_transform(range(1, {dim + 1}),"
            f" i -> e.embedding[i]::DOUBLE * c.cent[i]))"
        )
        ctes.append(f"""{prefix}n{r} AS (
  SELECT cid, cent,
         sqrt(list_sum(list_transform(cent, x -> x * x))) AS cn
  FROM {p}
),
{prefix}c{r} AS (
  SELECT e.vec_id, c.cid, round({dot} / (e.n * c.cn), 9) AS d
  FROM nrm e CROSS JOIN {prefix}n{r} c
),
{prefix}a{r} AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY d DESC, cid ASC) AS rn
    FROM {prefix}c{r}
  ) WHERE rn = 1
),
{prefix}s{r} AS (
  SELECT a.cell, p.i AS pos,
         sum(CAST(round(e.embedding[p.i]::DOUBLE * {fp}, 0) AS BIGINT)) AS sv,
         count(*) AS nn
  FROM {prefix}a{r} a JOIN {rel} e USING (vec_id), range(1, {dim + 1}) p(i)
  GROUP BY a.cell, p.i
),
{prefix}m{r} AS (
  SELECT cell, list(sv::DOUBLE / (nn * {fp}) ORDER BY pos) AS cent
  FROM {prefix}s{r} GROUP BY cell
),
{prefix}{r} AS (
  SELECT c.cid, coalesce(m.cent, c.cent) AS cent
  FROM {p} c LEFT JOIN {prefix}m{r} m ON m.cell = c.cid
)""")
    ctes.append(f"""{out} AS (
  SELECT cid, cent AS embedding,
         sqrt(list_sum(list_transform(cent, x -> x * x))) AS cn
  FROM {prefix}{rounds}
)""")
    return ",\n".join(ctes)


def lloyd_books_cte(
    seed_cte: str,
    parts: str,
    sub: int,
    rounds: int = BOOK_ROUNDS,
    out: str = "pcents",
    prefix: str = "tb",
) -> str:
    """CTE chain deriving Lloyd-trained per-subspace codebooks from
    scratch in SQL, ending in `{out} (cid, subspace, csub)`. `seed_cte`
    is the body of the round-0 codebook SELECT (must yield (cid,
    subspace, csub) with csub a DOUBLE list); `{parts}` must be a CTE
    of (vec_id, subspace, sub). Mirrors lloyd_subspace_books: 9dp
    squared-L2 argmin (ties to smallest code), fixed-point sums,
    empty codes keep their entry."""
    fp = f"{FP_SCALE:.1f}"
    ctes = [f"{prefix}0 AS (\n{seed_cte}\n)"]
    for r in range(1, rounds + 1):
        p = f"{prefix}{r - 1}"
        sqd = (
            f"round(list_sum(list_transform(range(1, {sub} + 1),"
            f" i -> (p.sub[i]::DOUBLE - c.csub[i])"
            f" * (p.sub[i]::DOUBLE - c.csub[i]))), 9)"
        )
        ctes.append(f"""{prefix}d{r} AS (
  SELECT p.vec_id, p.subspace, p.sub, c.cid, {sqd} AS d
  FROM {parts} p JOIN {p} c USING (subspace)
),
{prefix}a{r} AS (
  SELECT vec_id, subspace, sub, cid AS code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, subspace ORDER BY d ASC, cid ASC) AS rn
    FROM {prefix}d{r}
  ) WHERE rn = 1
),
{prefix}s{r} AS (
  SELECT subspace, code, p.i AS pos,
         sum(CAST(round(sub[p.i]::DOUBLE * {fp}, 0) AS BIGINT)) AS sv,
         count(*) AS nn
  FROM {prefix}a{r}, range(1, {sub} + 1) p(i)
  GROUP BY subspace, code, p.i
),
{prefix}m{r} AS (
  SELECT subspace, code, list(sv::DOUBLE / (nn * {fp}) ORDER BY pos) AS csub
  FROM {prefix}s{r} GROUP BY subspace, code
),
{prefix}{r} AS (
  SELECT c.subspace, c.cid, coalesce(m.csub, c.csub) AS csub
  FROM {p} c LEFT JOIN {prefix}m{r} m
    ON m.subspace = c.subspace AND m.code = c.cid
)""")
    ctes.append(
        f"{out} AS (\n  SELECT cid, subspace, csub FROM {prefix}{rounds}\n)"
    )
    return ",\n".join(ctes)
