"""SimHash near-duplicate detection, engine-portable.

SimHash (Charikar 2002; Manku/Jain/Sarma WWW'07 for the web-dedup
deployment) maps each document to a short bit signature whose Hamming
distance tracks cosine similarity of the term-frequency vectors:

1. term frequencies per document (the weight vector),
2. a B-bit hash per distinct term — here the first 8 hex chars of
   md5, identical in Spark and DuckDB, so the whole pipeline is
   oracle-checkable (like dedup/minhash.py, unlike JVM-seeded hashes),
3. per bit position b: sum over terms of (+weight if bit b of the
   term hash is set else −weight),
4. signature bit b = 1 iff that sum is positive.

Everything is JVM-side column arithmetic — token explode folding the
per-occurrence ±1 contributions straight into ONE per-doc aggregate
with B sums (see simhash() for why the per-(doc, tok) pre-aggregate
was dropped); one shuffle keyed by doc with map-side partial
aggregation, output linear in documents. B=32 keeps the signature in
a plain BIGINT on both engines.

Near-dup pairs use the standard Hamming-band trick: split the B bits
into `BANDS` contiguous byte bands; signatures within Hamming
distance d share at least one band when d < BANDS (pigeonhole), so an
equi-join on (band index, band value) finds all close pairs without a
cross product — the same shuffle shape as minhash LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table

BITS = 32
BANDS = 4  # 8-bit bands → catches all pairs with hamming < 4, most below ~8
BAND_WIDTH = BITS // BANDS


def simhash(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, simhash) — 32-bit SimHash of the token-frequency vector.

    Round-9 shape: ONE shuffle. The old explode → groupBy(doc, tok)
    → groupBy(doc) pre-aggregated term frequencies and then summed
    ±cnt per bit — but Σ_occurrences ±1 ≡ Σ_tokens ±cnt over
    integers, so the per-(doc, tok) exchange bought nothing: folding
    the ±1 contributions per OCCURRENCE straight into the per-doc
    aggregate drops one full exchange, and the map-side partial agg
    compresses each partition to n_docs × 32 longs before the one
    remaining shuffle. The token hash is projected ONCE per
    occurrence (not once per bit — 32 md5 calls per token without
    the explicit projection)."""
    from data_framework_spark.sources.tables import widen_scan

    docs = widen_scan(docs)  # token explode at full width on small files
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).select("doc", h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"s{b}")
        for b in range(BITS)
    ]
    sums = tok.groupBy("doc").agg(*bit_sums)
    sig = None
    for b in range(BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sums.select("doc", sig.cast("long").alias("simhash"))


def simhash_dedup(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Identical-signature dedup groups: (keep_id, group_size).

    Linear-output shape (one shuffle on the signature), same contract
    as dedup/minhash.py::signature_dedup.
    """
    return (
        simhash(docs, id_col, text_col)
        .groupBy("simhash")
        .agg(F.min("doc").alias("keep_id"), F.count(F.lit(1)).alias("group_size"))
        .select("keep_id", "group_size")
    )


def hamming_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    probe: DataFrame | None = None,
) -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash) ≤ max_hamming.

    Candidates come from the byte-band equi-join (exact for
    max_hamming < BANDS by pigeonhole); verification is one
    bit_count(xor) per candidate. With `probe` (column `doc`) the left
    side shrinks to the probe set — cost linear in |probe|·bucket.
    """
    # r17 (guide §2.4/§5): the band self-join consumes the signature
    # subtree on BOTH sides, and exchange reuse does not cover the
    # per-occurrence md5 + 32-bit-sum aggregate feeding it — the full
    # signature build ran twice per query. One eager localCheckpoint
    # of the doc-sized (doc, simhash) frame materializes it once
    # (2.23 → 1.79 s warm min at sf0.1, interleaved A/B; identical
    # rows). Same materialize-shared-subtree pattern as
    # dedup/clusters.connected_components; at scale the checkpointed
    # frame is 16 B/doc vs re-hashing every token occurrence.
    sig = simhash(docs, id_col, text_col).localCheckpoint(eager=True)
    bands = sig.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * BAND_WIDTH)
                        .bitwiseAND(F.lit(2**BAND_WIDTH - 1))
                        .alias("band_val"),
                    )
                    for i in range(BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc", "simhash", F.col("bb.band").alias("band"), F.col("bb.band_val").alias("band_val"))
    left = bands if probe is None else bands.join(F.broadcast(probe), on="doc")
    right = bands.select(
        F.col("doc").alias("doc_r"),
        F.col("simhash").alias("simhash_r"),
        "band",
        "band_val",
    )
    ham = F.bit_count(
        F.col("simhash").bitwiseXOR(F.col("simhash_r"))
    )
    return (
        left.join(right, on=["band", "band_val"])
        .filter(F.col("doc") != F.col("doc_r"))
        .select(
            F.least(F.col("doc"), F.col("doc_r")).alias("a"),
            F.greatest(F.col("doc"), F.col("doc_r")).alias("b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --- driver-checkable query instantiations ---------------------------------


def q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_dedup(docs, "doc_id", "text")


def _sig_sql() -> str:
    """Shared DuckDB CTEs computing (doc, simhash) — mirrors simhash()."""
    bit_sums = ", ".join(
        f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN cnt ELSE -cnt END) AS s{b}"
        for b in range(BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(BITS)
    )
    return f"""
tf AS (
  SELECT doc, tok, count(*) AS cnt
  FROM (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  GROUP BY doc, tok
),
hashed AS (
  SELECT doc, ('0x' || substring(md5(tok), 1, 8))::UBIGINT::BIGINT AS hv, cnt
  FROM tf
),
bitsums AS (
  SELECT doc, {bit_sums} FROM hashed GROUP BY doc
),
sig AS (
  SELECT doc, ({sig})::BIGINT AS simhash FROM bitsums
)"""


Q_SIMHASH_DEDUP_SQL = f"""
WITH {_sig_sql()}
SELECT min(doc) AS keep_id, count(*) AS group_size
FROM sig GROUP BY simhash
"""


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-≤3 near-dup pairs of a probe set (doc_id < 50) vs the
    corpus, via byte-band LSH — exact for this radius (pigeonhole)."""
    docs = load_table(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") < 50).select(F.col("doc_id").alias("doc"))
    return hamming_pairs(docs, "doc_id", "text", max_hamming=3, probe=probe)


Q_SIMHASH_NEAR_DUPS_SQL = f"""
WITH {_sig_sql()},
bands AS (
  {' UNION ALL '.join(
    f"SELECT doc, simhash, {i} AS band, (simhash >> {i * BAND_WIDTH}) & {2**BAND_WIDTH - 1} AS band_val FROM sig"
    for i in range(BANDS)
  )}
)
SELECT DISTINCT
  least(l.doc, r.doc) AS a,
  greatest(l.doc, r.doc) AS b,
  bit_count(xor(l.simhash, r.simhash))::INT AS hamming
FROM bands l
JOIN bands r ON l.band = r.band AND l.band_val = r.band_val
WHERE l.doc < 50 AND l.doc <> r.doc
  AND bit_count(xor(l.simhash, r.simhash)) <= 3
"""
