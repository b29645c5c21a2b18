"""Deterministic stratified sampling / corpus mixing.

Training-data pipelines don't sample with an RNG — a mixture must be
REPRODUCIBLE across reruns, engines, and partitionings, and must
stay stable when the corpus is appended to (a doc's keep/drop fate
depends only on its key, never on row order or partition layout). The
standard construction: hash the stable key to a uniform fraction in
[0, 1) and keep the row iff fraction < its stratum's rate.

The hash fraction here is the first 8 hex digits of md5(key) / 2^32 —
bit-identical in Spark (`conv(substring(md5(..), 1, 8), 16, 10)`) and
DuckDB (`('0x' || substring(md5(..), 1, 8))::UBIGINT`), the same
cross-engine trick as the sign-LSH hyperplanes. Rates ride along as a
broadcast dimension table, exactly how a mixture config ships at
scale; the scan stays a single pass with the predicate evaluated
row-local (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table

# mixture config: fraction of each source bucket to keep
MIX_RATES: dict[str, float] = {
    **{f"src{i}": 0.8 for i in range(0, 5)},     # high-quality: keep most
    **{f"src{i}": 0.4 for i in range(5, 12)},    # mid tier
    **{f"src{i}": 0.1 for i in range(12, 20)},   # low tier: thin sample
}


def hash_fraction(key: F.Column) -> F.Column:
    """Uniform [0, 1) fraction from a stable key — md5-derived, so
    engine- and partitioning-independent."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)


# the DuckDB spelling of hash_fraction() — oracle SQL strings must use
# THIS template (format with the key column name) so the Spark and
# oracle sides stay in lockstep
HASH_FRACTION_SQL_TMPL = (
    "(('0x' || substring(md5({key}::VARCHAR), 1, 8))::UBIGINT::DOUBLE"
    " / 4294967296.0)"
)


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, float]
) -> DataFrame:
    """Keep each row iff hash_fraction(key) < rates[stratum]; rows in
    strata absent from `rates` are dropped."""
    rate_rows = [(s, float(r)) for s, r in sorted(rates.items())]
    spark = df.sparkSession
    rate_df = spark.createDataFrame(rate_rows, f"{stratum} string, __rate double")
    return (
        df.join(F.broadcast(rate_df), stratum)
        .filter(hash_fraction(F.col(key)) < F.col("__rate"))
        .drop("__rate")
    )


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-tier corpus mixture over `documents`: per-source keep
    rates applied via deterministic hash sampling; returns the kept
    per-source counts and mean document length so the mixture's
    composition is the checked artifact."""
    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(docs, "doc_id", "source", MIX_RATES)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("source")
    )


def _mix_sql() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in sorted(MIX_RATES.items())
    )
    return f"""
SELECT source,
       count(*) AS n_kept,
       round(avg(n_chars), 4) AS avg_chars
FROM documents
WHERE {HASH_FRACTION_SQL_TMPL.format(key="doc_id")}
      < (CASE source {cases} ELSE 0.0 END)
GROUP BY source
ORDER BY source
"""


Q_CORPUS_MIX_SQL = _mix_sql()


# --- sequence packing ------------------------------------------------------


# docs per doc_id-range chunk for the two-level prefix sum; chunk ids
# are monotone in doc_id, so chunk order == doc_id order within a
# stratum. Small enough that a test-scale stratum still splits into
# several chunks; at 100 TB raise it so the per-stratum chunk-totals
# table stays millions of rows, not billions.
PACK_CHUNK = 4096


def pack_bins(docs: DataFrame, budget: int = 2048) -> DataFrame:
    """Assign (doc_id, source, n_tok) rows to fixed-budget bins by
    contiguous fill in doc_id order within each source stratum: a doc
    starts a new bin when it would cross the budget boundary, i.e.
    bin = floor(exclusive-prefix-sum / budget).

    The prefix sum is TWO-LEVEL so no stratum is a single task (a
    plain window partitioned by source serializes each stratum):
      1. local running sums within (source, chunk), chunk =
         doc_id // PACK_CHUNK — parallelism = number of chunks;
      2. per-chunk totals → exclusive offsets via a window over the
         chunk-totals table (rows = chunks, thousands of times smaller
         than the input) — joined back on (source, chunk), the same
         key the local window already partitioned by.
    No broadcast hint on the offsets join: at corpus scale the totals
    table can itself be large; AQE picks broadcast when it fits."""
    from pyspark.sql import Window as W

    toks = docs.withColumn("chunk", F.floor(F.col("doc_id") / PACK_CHUNK))
    w_local = W.partitionBy("source", "chunk").orderBy("doc_id")
    local = toks.withColumn("local_cum", F.sum("n_tok").over(w_local))
    chunk_tot = local.groupBy("source", "chunk").agg(
        F.sum("n_tok").alias("__ctot")
    )
    w_chunks = W.partitionBy("source").orderBy("chunk")
    offsets = chunk_tot.withColumn(
        "__offset", F.sum("__ctot").over(w_chunks) - F.col("__ctot")
    ).select("source", "chunk", "__offset")
    return (
        local.join(offsets, ["source", "chunk"])
        .withColumn(
            "prefix", F.col("__offset") + F.col("local_cum") - F.col("n_tok")
        )
        .withColumn("bin", F.floor(F.col("prefix") / budget))
        .drop("chunk", "local_cum", "__offset")
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-budget bins (2048
    "tokens" ≈ whitespace words here) by contiguous fill in a
    deterministic order — the batch-construction step of a pretraining
    pipeline. Bins never span strata (the property that lets packing
    parallelize); within a stratum the prefix sum is two-level (see
    pack_bins) so the plan has no single-task stage. Emits per-bin
    document count and fill so over/under-packing is what the oracle
    checks."""
    budget = 2048
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    packed = pack_bins(
        docs.select("doc_id", "source", n_tok.alias("n_tok")), budget
    )
    return (
        packed.groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("fill"),
        )
        .orderBy("source", "bin")
    )


Q_PACK_SEQUENCES_SQL = """
WITH toks AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
  FROM documents
),
packed AS (
  SELECT source,
         ((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok)
           // 2048)::BIGINT AS bin,
         n_tok
  FROM toks
)
SELECT source, bin, count(*) AS n_docs, sum(n_tok)::BIGINT AS fill
FROM packed
GROUP BY source, bin
ORDER BY source, bin
"""


# --- deterministic weighted sampling (A-ES) --------------------------------

WS_K = 200  # sample size


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis-Spirakis
    (A-ES): each doc gets key = ln(u)/w for a deterministic uniform
    u ∈ (0,1) derived from md5(doc_id) — so inclusion probability is
    proportional to weight (here n_chars: longer docs more likely) —
    and the sample is the global top-K by key. The hash-derived u
    replaces the RNG for the same reason as `stratified_sample`:
    reproducible across engines, partitionings, and reruns.

    u = (md5_prefix + 0.5) / 2^32 keeps u strictly inside (0,1) (no
    ln(0) / ln(1) degeneracies); the key is rounded to 9 dp before
    ranking so a last-ulp ln() difference between engines cannot
    reorder the cut (same guard as the sign-LSH projections).

    Scale shape: per-row key computation is shuffle-free; the global
    top-K is a TakeOrdered (per-partition top-K + driver merge of
    K×partitions rows) — no full sort of the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col("n_chars"), 9)
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("key"))
        .orderBy(F.col("key").desc(), F.col("doc_id").asc())
        .limit(WS_K)
    )


Q_WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars,
       round(ln((('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::DOUBLE
                 + 0.5) / 4294967296.0) / n_chars, 9) AS key
FROM documents
ORDER BY key DESC, doc_id ASC
LIMIT {WS_K}
"""


# --- temperature-weighted domain mixing ------------------------------------


# multilingual-sampling temperature (Conneau et al. 2020, XLM-R §3.1:
# q_i ∝ p_i^α flattens the domain distribution toward small domains)
MIX_ALPHA = 0.7
# token budget the weights are projected onto
MIX_BUDGET = 1_000_000


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixing report: per source, its raw
    token share p_i, the temperature-flattened sampling weight
    w_i = p_i^α / Σ p_j^α, and the implied epochs-over-source at a
    fixed token budget (w_i·B / tokens_i > 1 means the sampler
    repeats that domain). This is the planning artifact a mixture-
    weighted data loader consumes.

    Scale shape: one corpus aggregate down to #sources rows; the
    normalizing window then runs over that tiny frame only (the
    single-partition window is bounded by the domain count, never the
    corpus)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias(
            "n_tokens"
        ),
    )
    w_all = W.partitionBy()
    # two stages: windows can't nest inside another window's argument
    shares = per_src.withColumn(
        "p", F.col("n_tokens") / F.sum("n_tokens").over(w_all)
    )
    q = F.pow(F.col("p"), F.lit(MIX_ALPHA))
    w = q / F.sum(q).over(w_all)
    return (
        shares.select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("p"), 6).alias("p_raw"),
            F.round(w, 6).alias("w_temp"),
            F.round(w * MIX_BUDGET / F.col("n_tokens"), 4).alias("epochs"),
        )
        .orderBy("source")
    )


Q_DOMAIN_MIX_SQL = f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
  FROM documents
  GROUP BY source
),
shares AS (
  SELECT source, n_docs, n_tokens,
         n_tokens / sum(n_tokens) OVER () AS p
  FROM per_src
)
SELECT source, n_docs, n_tokens,
       round(p, 6) AS p_raw,
       round(pow(p, {MIX_ALPHA}) / sum(pow(p, {MIX_ALPHA})) OVER (), 6)
         AS w_temp,
       round(pow(p, {MIX_ALPHA}) / sum(pow(p, {MIX_ALPHA})) OVER ()
             * {MIX_BUDGET} / n_tokens, 4) AS epochs
FROM shares
ORDER BY source
"""
