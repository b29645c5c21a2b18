"""MinHash + LSH near-duplicate detection, engine-portable.

Pipeline (the standard shingle → minhash → band → bucket-join shape):
1. shingle each document into its distinct word set (unigram shingles
   — right for this corpus's tiny vocabulary; `n`-gram shingling is a
   parameter upstream),
2. K minhash components: h_k(doc) = min over shingles of
   md5(shingle || '#' || k)  — md5 is identical in Spark and DuckDB,
   so the whole pipeline is oracle-checkable SQL, unlike
   Spark-ML's MinHashLSH whose hash seeds are JVM-internal,
3. LSH bands: B bands of R rows (K = B·R); band hash =
   md5(concat of its R components),
4. candidate pairs = self-join on (band index, band hash), a < b,
5. verification: exact Jaccard on the candidates only.

Scale shape: step 2 is explode(shingles) → groupBy(doc) — one shuffle
keyed by doc_id with map-side partial min. Step 4 shuffles the tiny
signature table on band hash; the quadratic blow-up inside a bucket
is the known LSH failure mode for pathological corpora (mitigate with
bucket-size caps upstream). Step 5 touches only candidates, never the
full cross product — that's the point of LSH vs brute-force O(n²).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table

logger = logging.getLogger(__name__)

K = 8  # minhash components
BANDS = 4  # → 2 rows per band


def _shingles(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, shingle) rows — distinct word unigrams per document.

    Round-9 shape: explode `array_distinct(split(...))` — per-row
    dedup inside whole-stage codegen, NO exchange at all. The round-8
    raw-split + dropDuplicates form traded the Generate child for a
    (doc, shingle) shuffle per consumer; isolated measurement
    (fresh session, n=3 warm, sf0.1 — SURVEY §8 round-9) showed the
    shuffle buys nothing here (pairs 2.77 vs 2.76 s, dedup 0.82 vs
    0.84 s) and loses on the multi-consumer cluster path (3.84 vs
    3.16 s): the Generate per-output-row trap bites interpreted HOFs
    (dedup/spans), but array_distinct(split()) is codegen. At 100 TB
    the difference is structural — the pair-verify consumes this
    frame three times, and this form adds ZERO exchanges where the
    round-8 form added one per consumer. widen_scan parallelizes past
    the test corpus's one-row-group scan (no-op at scale)."""
    from data_framework_spark.sources.tables import widen_scan

    return widen_scan(docs).select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("shingle"),
    )


def minhash_signatures(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per doc: columns h0..h{K-1} (hex md5 minima)."""
    sh = _shingles(docs, id_col, text_col)
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{k}")))).alias(f"h{k}")
        for k in range(K)
    ]
    return sh.groupBy("doc").agg(*aggs)


def lsh_bands(sig: DataFrame) -> DataFrame:
    """(doc, band, band_hash) — md5 over each band's R components."""
    rows_per_band = K // BANDS
    band_cols = []
    for b in range(BANDS):
        parts = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat(*parts)).alias("band_hash"))
        )
    return sig.select(
        "doc", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))


def _cap_buckets(bands: DataFrame, max_bucket: int) -> DataFrame:
    """Drop LSH buckets larger than `max_bucket`, logging the dropped
    bucket/pair counts so the truncation is never silent."""
    sizes = bands.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    over = (
        sizes.filter(F.col("__bn") > max_bucket)
        .agg(
            F.count(F.lit(1)).alias("buckets"),
            F.sum(
                F.col("__bn") * (F.col("__bn") - F.lit(1)) / F.lit(2)
            ).alias("pairs"),
        )
        .collect()[0]
    )
    if over["buckets"]:
        logger.warning(
            "candidate_pairs: dropping %d LSH buckets over "
            "max_bucket=%d (~%d intra-bucket candidate pairs); "
            "use signature_dedup for degenerate clusters",
            over["buckets"],
            max_bucket,
            int(over["pairs"]),
        )
    # the size join shuffles on the same (band, band_hash) key as the
    # downstream join, so the partitioning is reused
    return bands.join(
        sizes.filter(F.col("__bn") <= max_bucket), on=["band", "band_hash"]
    ).drop("__bn")


def candidate_pairs(
    bands: DataFrame,
    probe: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Distinct pairs sharing at least one band bucket.

    Without `probe`: all (a < b) pairs — quadratic in bucket sizes,
    which is the LSH failure mode on degenerate corpora (thousands of
    identical docs land in one bucket → millions of pairs). Pass
    `max_bucket` to drop buckets larger than the cap before the
    self-join; the dropped bucket/pair counts are logged so the
    truncation is never silent. A dropped mega-bucket is better
    handled by `signature_dedup` (linear collapse) than by pair
    enumeration anyway.

    With `probe` (a DataFrame of doc ids, column `doc`): only pairs
    touching a probe doc — the left join side shrinks to the probe
    set, so cost scales with |probe|·bucket, not bucket². Pairs are
    normalized to (least, greatest) so the two forms agree.

    `max_bucket` applies in BOTH modes: with probe, an uncapped
    mega-bucket still blows up as |probe|·bucket, so the cap filters
    `bands` before either branch.
    """
    if max_bucket is not None:
        bands = _cap_buckets(bands, max_bucket)
    # r17 (guide §2.4/§5): the bucket self-join consumes the band
    # subtree on both sides — without materialization the whole
    # shingle→signature→band pipeline executes twice per query (the
    # simhash.hamming_pairs finding, same fix). The frame is 4 rows
    # per doc (doc, band, band_hash).
    bands = bands.localCheckpoint(eager=True)
    right = bands.alias("r")
    if probe is None:
        return (
            bands.alias("l")
            .join(
                right,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.band_hash") == F.col("r.band_hash"))
                & (F.col("l.doc") < F.col("r.doc")),
            )
            .select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
            .distinct()
        )
    left = bands.join(F.broadcast(probe), on="doc").alias("l")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc") != F.col("r.doc")),
        )
        .select(
            F.least(F.col("l.doc"), F.col("r.doc")).alias("a"),
            F.greatest(F.col("l.doc"), F.col("r.doc")).alias("b"),
        )
        .distinct()
    )


def verified_near_dups(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    probe: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidates filtered by exact word-set Jaccard ≥ threshold."""
    sh = _shingles(docs, id_col, text_col)
    pairs = candidate_pairs(
        lsh_bands(minhash_signatures(docs, id_col, text_col)),
        probe=probe,
        max_bucket=max_bucket,
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        pairs.join(sh.alias("sa"), F.col("a") == F.col("sa.doc"))
        .join(
            sh.alias("sb"),
            (F.col("b") == F.col("sb.doc"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.alias("na"), F.col("a") == F.col("na.doc"))
        .join(sizes.alias("nb"), F.col("b") == F.col("nb.doc"))
        .select(
            "a",
            "b",
            F.round(
                F.col("inter")
                / (F.col("na.n") + F.col("nb.n") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def verified_near_dups_arrow(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    probe: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """The Arrow-vectorized PROBE-mode route to the exact same pairs
    as `verified_near_dups` (equality test-pinned): the LSH candidate
    enumeration is unchanged, but the exact-Jaccard verify swaps the
    two corpus-sized (doc, shingle) joins for the shared membership-
    matrix kernel (dedup/ngram.membership_jaccard_pairs) over
    xxhash64-hashed shingle sets — every probe×doc Jaccard in one
    corpus-linear Arrow pass, then an inner join against the
    broadcast candidate set keeps exactly the band-sharing pairs.
    Identical output: the kernel's 6dp half-away rounding matches
    F.round, and a 64-bit shingle-hash collision inside one pair's
    word sets is ~1e-13 (the dedup/ngram.py precedent). Measured at
    sf0.1: 2.85 → ~1.9 s warm; at 100 TB the win grows — the JVM
    verify shuffles the full shingle table twice per invocation,
    this route shuffles only the raw (id, text) rows once.

    Probe normalization invariant the candidate join relies on: in
    probe mode every candidate pair has at least one probe side, and
    (a, b) = (least, greatest), so `a` is always comparable with the
    kernel's min/max normalization.

    Doc ids must be integers (the kernel vectorizes them as int64 —
    the same bound as ngram_jaccard_pairs_arrow); generic-id callers
    fall back to the JVM join route rather than dying with an
    executor-side cast error (round-9 review)."""
    if probe is None:
        raise ValueError("verified_near_dups_arrow requires a probe set")
    if dict(docs.dtypes).get(id_col) not in ("tinyint", "smallint", "int", "bigint"):
        return verified_near_dups(
            docs, id_col, text_col, threshold, probe, max_bucket
        )
    from data_framework_spark.dedup.ngram import membership_jaccard_pairs

    pairs = candidate_pairs(
        lsh_bands(minhash_signatures(docs, id_col, text_col)),
        probe=probe,
        max_bucket=max_bucket,
    )
    shingle_hashes = F.transform(
        F.array_distinct(F.split(F.col(text_col), " ")),
        lambda s: F.xxhash64(s),
    )
    # explicit-width repartition before the per-doc gram build, the
    # dedup/ngram.py convention (AQE would coalesce the byte-small
    # exchange; mapInPandas consumes each row once, so no
    # re-evaluation hazard)
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    gram_sets = docs.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col).alias("doc"), shingle_hashes.alias("grams")
    )
    probe_rows = (
        docs.join(F.broadcast(probe), docs[id_col] == probe["doc"])
        .select(probe["doc"], shingle_hashes.alias("grams"))
        .collect()
    )
    verified = membership_jaccard_pairs(gram_sets, probe_rows, threshold)
    # candidate filter LAST: the thresholded verified set is small, the
    # candidate set is bounded by |probe|·bucket — broadcast it
    return verified.join(F.broadcast(pairs), ["a", "b"])


def signature_dedup(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Minhash-signature dedup: docs with identical full K-component
    signatures collapse to one representative (min id).

    This is the linear-output shape of minhash dedup — one shuffle on
    the signature, no pair enumeration at all. Right default when the
    goal is "drop near-identical docs" rather than "list all pairs":
    at 100 TB a pair list over a clustered corpus is quadratic in the
    cluster sizes (measured 9.3M pairs on 5k synthetic docs), while
    this stays O(n).
    """
    sig = minhash_signatures(docs, id_col, text_col)
    return (
        sig.groupBy(*[f"h{k}" for k in range(K)])
        .agg(
            F.min("doc").alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select("keep_id", "group_size")
    )


# --- driver-checkable query instantiations ---------------------------------


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return signature_dedup(docs, "doc_id", "text")


Q_MINHASH_DEDUP_SQL = f"""
WITH sh AS (
  SELECT doc_id AS doc, unnest(list_distinct(string_split(text, ' '))) AS shingle
  FROM documents
),
sig AS (
  SELECT doc,
    {', '.join(f"min(md5(shingle || '#{k}')) AS h{k}" for k in range(K))}
  FROM sh GROUP BY doc
)
SELECT min(doc) AS keep_id, count(*) AS group_size
FROM sig
GROUP BY {', '.join(f'h{k}' for k in range(K))}
"""


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS of a bounded probe set (doc_id < 50) vs the full
    corpus — the "find duplicates of these docs" shape whose cost and
    output stay linear in the probe-set size even on a clustered
    corpus (the all-pairs form measured 9.3M pairs on 5k docs).
    Served by the Arrow membership-matrix verify (equality to the
    JVM join route is test-pinned; same oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("doc")
    )
    return verified_near_dups_arrow(
        docs, "doc_id", "text", threshold=0.9, probe=probe
    )


Q_MINHASH_NEAR_DUPS_SQL = f"""
WITH sh AS (
  SELECT doc_id AS doc, unnest(list_distinct(string_split(text, ' '))) AS shingle
  FROM documents
),
sig AS (
  SELECT doc,
    {', '.join(f"min(md5(shingle || '#{k}')) AS h{k}" for k in range(K))}
  FROM sh GROUP BY doc
),
bands AS (
  {' UNION ALL '.join(f"SELECT doc, {b} AS band, md5(h{2 * b} || h{2 * b + 1}) AS band_hash FROM sig" for b in range(BANDS))}
),
pairs AS (
  SELECT DISTINCT least(l.doc, r.doc) AS a, greatest(l.doc, r.doc) AS b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.band_hash = r.band_hash AND l.doc <> r.doc
  WHERE l.doc < 50
),
sizes AS (SELECT doc, count(*) AS n FROM sh GROUP BY doc),
inter AS (
  SELECT p.a, p.b, count(*) AS inter
  FROM pairs p
  JOIN sh sa ON p.a = sa.doc
  JOIN sh sb ON p.b = sb.doc AND sa.shingle = sb.shingle
  GROUP BY p.a, p.b
)
SELECT i.a, i.b,
       round(i.inter * 1.0 / (na.n + nb.n - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes na ON i.a = na.doc
JOIN sizes nb ON i.b = nb.doc
WHERE round(i.inter * 1.0 / (na.n + nb.n - i.inter), 6) >= 0.9
"""
