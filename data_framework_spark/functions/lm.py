"""Corpus language-model statistics: unigram log-probability scoring
and Zipf-law diagnostics.

Extension layer (SURVEY.md §7 phase 5) — the KenLM-style quality
signal used by CCNet/Gopher-era pipelines (Wenzek et al. 2020 §4.3)
reduced to its distributable core: train a unigram LM over the corpus
itself, then score every document by mean token log-probability.
Low (very negative) scores mark documents full of rare junk tokens;
implausibly high scores mark degenerate repetition of common tokens —
both tails get cut in a real pipeline.

Scale posture: the LM "training" is one token-count aggregate whose
result is vocabulary-sized — Zipf's law keeps that orders of
magnitude smaller than the corpus, so it broadcasts (at 100 TB a
frequency cutoff caps the table; a token absent from the capped
vocabulary takes the floor probability, same as here for unseen
tokens — the join below is an inner join ONLY because the LM and the
scored corpus are the same data, so every token is in-vocabulary by
construction). Scoring is then a broadcast hash join + one shuffle on
doc_id for the per-doc mean — no Python anywhere.

The Zipf fit is the curation diagnostic that validates a corpus looks
like natural language at all: OLS slope of ln(freq) on ln(rank) over
the top terms (natural text ≈ −1). A synthetic or template-exploded
corpus shows up instantly as a flat or cliff-shaped slope. One
vocabulary-sized aggregate + a single-partition window over the top
ZIPF_TOP_TERMS rows (bounded, tiny) + one regression aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_framework_spark.functions.numeric import (
    stable_round,
    stable_round_sql,
)
from data_framework_spark.functions.text import tokens
from data_framework_spark.sources.tables import load_table

ZIPF_TOP_TERMS = 100


def _vocab_counts(docs: DataFrame) -> DataFrame:
    """(tok, c) token frequency table — vocabulary-sized."""
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram-LM score: avg over tokens of
    ln(count(tok)/total_tokens), the corpus scored by its own unigram
    model. The vocabulary frame (with the total folded in as a
    column) broadcasts; per-token scoring is a broadcast hash join in
    whole-stage codegen; the only corpus-sized shuffle is the per-doc
    mean."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = _vocab_counts(docs)
    total = vocab.agg(F.sum("c").alias("t"))
    lm = vocab.crossJoin(F.broadcast(total)).select(
        "tok", (F.log(F.col("c")) - F.log(F.col("t"))).alias("logp")
    )
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    return (
        tok.join(F.broadcast(lm), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            # stable_round: avg(logp) <= 0 approaches zero from
            # below, so a bare round yields +0.0 on Spark (BigDecimal
            # has no signed zero) vs -0.0 on DuckDB — the round-6
            # heaps_fit digest-red class (round-9 review)
            stable_round(F.avg("logp"), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


Q_UNIGRAM_LOGPROB_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok, count(*)::DOUBLE AS c FROM tok GROUP BY tok
),
tot AS (
  SELECT sum(c) AS t FROM vocab
),
lm AS (
  SELECT tok, ln(c) - ln(t) AS logp FROM vocab CROSS JOIN tot
)
SELECT doc_id, count(*) AS n_tok,
       {stable_round_sql('avg(logp)', 4)} AS avg_logprob
FROM tok JOIN lm USING (tok)
GROUP BY doc_id
ORDER BY doc_id
"""


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the top ZIPF_TOP_TERMS terms: OLS slope and
    R² of ln(freq) against ln(rank) (rank by freq desc, token asc for
    a deterministic total order), plus vocabulary size and total
    token count. Single-row corpus-health diagnostic; the
    single-partition window runs over only the bounded top-N frame."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = _vocab_counts(docs)
    topn = (
        vocab.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(ZIPF_TOP_TERMS)
        .withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.col("c").desc(), F.col("tok").asc())
            ),
        )
    )
    totals = vocab.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("c").cast("long").alias("total_tokens"),
    )
    fit = topn.agg(
        F.count(F.lit(1)).alias("n_terms"),
        stable_round(F.regr_slope(F.log("c"), F.log("rank")), 4).alias(
            "slope"
        ),
        stable_round(F.regr_r2(F.log("c"), F.log("rank")), 4).alias("r2"),
    )
    return fit.crossJoin(F.broadcast(totals)).select(
        "n_terms", "slope", "r2", "vocab_size", "total_tokens"
    )


Q_ZIPF_FIT_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok, count(*)::DOUBLE AS c FROM tok GROUP BY tok
),
topn AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rank
  FROM vocab
  ORDER BY c DESC, tok ASC
  LIMIT {ZIPF_TOP_TERMS}
),
fit AS (
  SELECT count(*) AS n_terms,
         {stable_round_sql('regr_slope(ln(c), ln(rank))', 4)} AS slope,
         {stable_round_sql('regr_r2(ln(c), ln(rank))', 4)} AS r2
  FROM topn
),
totals AS (
  SELECT count(*) AS vocab_size, sum(c)::BIGINT AS total_tokens FROM vocab
)
SELECT n_terms, slope, r2, vocab_size, total_tokens
FROM fit CROSS JOIN totals
"""


HEAPS_PREFIXES = 10


def q_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit: V(N) ≈ K·N^β, estimated as
    the OLS slope of ln(distinct tokens) on ln(total tokens) over
    HEAPS_PREFIXES doc_id-ordered corpus prefixes. Natural corpora
    show β ≈ 0.4-0.6; a template-exploded corpus flattens early
    (β → 0) and a random-id-stuffed one stays near 1 — the companion
    diagnostic to q_zipf_fit.

    Scale shape: NO per-prefix distinct scans and NO threshold theta
    join — every doc (and every token's FIRST-occurrence doc, from
    one vocabulary-sized min aggregate) is assigned its prefix BAND
    i = ceil(doc_id·P/max_id) row-locally, then V and N per prefix
    are cumulative sums over the P-row band frame. Two corpus-sized
    aggregates total; everything after runs on ≤P rows."""
    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id").alias("m"))
    p = HEAPS_PREFIXES

    def band(col):  # ceil(col * p / m), clamped to [1, p]
        return F.greatest(
            F.lit(1),
            F.floor((col * p + F.col("m") - 1) / F.col("m")).cast("long"),
        )

    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    first_occ = tok.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    v_band = (
        first_occ.crossJoin(F.broadcast(max_id))
        .groupBy(band(F.col("first_doc")).alias("i"))
        .agg(F.count(F.lit(1)).alias("dv"))
    )
    n_band = (
        docs.crossJoin(F.broadcast(max_id))
        .groupBy(band(F.col("doc_id")).alias("i"))
        .agg(F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("dn"))
    )
    w_cum = W.orderBy("i").rowsBetween(W.unboundedPreceding, W.currentRow)
    per_thr = (
        v_band.join(n_band, "i", "full_outer")
        .select(
            "i",
            F.sum(F.coalesce(F.col("dv"), F.lit(0))).over(w_cum).alias("v"),
            F.sum(F.coalesce(F.col("dn"), F.lit(0))).over(w_cum).alias("n"),
        )
    )
    # NO r2 here: on a saturated (template-like) corpus ln(v) is
    # constant, making regr_r2 a 0/0 whose value is nondeterministic
    # catastrophic-cancellation noise (observed flapping in DuckDB).
    # beta on the same corpus is a cancellation AROUND zero whose
    # rounded result flaps between +0.0 and -0.0 across DuckDB runs
    # (round-6 driver red) — and the driver digest distinguishes
    # signed zeros, so beta goes through stable_round on both
    # engines. v_first==vocab_full is the saturation flag.
    return per_thr.agg(
        F.count(F.lit(1)).alias("n_points"),
        stable_round(F.regr_slope(F.log("v"), F.log("n")), 4).alias("beta"),
        F.min("v").cast("long").alias("v_first"),
        F.max("v").cast("long").alias("vocab_full"),
        F.max("n").cast("long").alias("tokens_full"),
    )


Q_HEAPS_FIT_SQL = f"""
WITH mx AS (
  SELECT max(doc_id) AS m FROM documents
),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
first_occ AS (
  SELECT tok, min(doc_id) AS first_doc FROM tok GROUP BY tok
),
v_band AS (
  SELECT greatest(1, floor((first_doc * {HEAPS_PREFIXES} + m - 1)
                           / m)::BIGINT) AS i,
         count(*) AS dv
  FROM first_occ, mx GROUP BY i
),
n_band AS (
  SELECT greatest(1, floor((doc_id * {HEAPS_PREFIXES} + m - 1)
                           / m)::BIGINT) AS i,
         sum(len(string_split(text, ' ')))::BIGINT AS dn
  FROM documents, mx GROUP BY i
),
per_thr AS (
  SELECT i,
         sum(coalesce(dv, 0)) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS v,
         sum(coalesce(dn, 0)) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS n
  FROM v_band FULL OUTER JOIN n_band USING (i)
)
SELECT count(*) AS n_points,
       {stable_round_sql('regr_slope(ln(v), ln(n))', 4)} AS beta,
       min(v)::BIGINT AS v_first,
       max(v)::BIGINT AS vocab_full,
       max(n)::BIGINT AS tokens_full
FROM per_thr
"""
