"""Heavy hitters via per-partition Misra-Gries summaries + exact
re-count — approximate-accelerated EXACT top frequency detection.

The problem at 100 TB: "which tokens exceed 1/k of the corpus?" The
naive answer shuffles every token for a full groupBy — the shuffle is
corpus-sized. The sketch route:

1. each partition builds a Misra-Gries summary with K counters
   (`mapInPandas`, state carried across Arrow batches within the
   partition — one sequential pass, O(K) memory);
2. the union of partition summaries is a guaranteed SUPERSET of the
   true heavy hitters: if count(x) > n/K globally, then some
   partition has count_p(x) > n_p/K > n_p/(K+1), and Misra-Gries
   with K counters never evicts such an item [Misra & Gries 1982];
3. only the candidates (≤ K × #partitions rows — the one bounded
   driver-side collect, ~1.6k rows at 32 partitions and still only
   K·P at cluster scale) are re-counted exactly — the second pass
   broadcasts the tiny candidate set and filters BEFORE aggregating,
   so the shuffle carries candidate tokens only; the summaries also
   carry per-partition row counts (tok=NULL marker rows), so the
   global n costs no separate scan;
4. the exact threshold test (integer arithmetic: cnt·K > n) then
   yields EXACTLY the true heavy-hitter set — the DuckDB oracle
   computes it with a plain GROUP BY/HAVING, and the hash must match.

Same design stance as minhash-LSH + exact-Jaccard verification:
the approximation prunes candidates, the verification restores
exactness, and correctness is oracle-checked rather than asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.functions.text import tokens
from data_framework_spark.sources.tables import load_table

HH_K = 50  # heavy hitter threshold: count > n / HH_K


def mg_fold(counters, vc, k: int):
    """One Misra-Gries merge step [Agarwal et al., PODS 2012 §3]:
    fold an exact per-batch ``value_counts()`` Series into an MG
    summary Series (add counters; if over k entries, subtract the
    (k+1)-th largest and keep the strictly positive remainder).
    Returns the new summary (≤ k entries). Shared by the batch
    partition sketch and the streaming per-bucket state kernel."""
    counters = vc if counters is None else counters.add(vc, fill_value=0)
    if len(counters) > k:
        m = counters.nlargest(k + 1).iloc[-1]
        counters = counters[counters > m] - m
    return counters


def _mg_partial(k: int):
    """mapInPandas kernel: one Misra-Gries summary per partition.

    Vectorized via the MG merge rule [Agarwal et al., "Mergeable
    Summaries", PODS 2012, §3]: each Arrow batch's exact
    ``value_counts()`` is itself a zero-error summary; merging two MG
    summaries = add counters, subtract the (k+1)-th largest value,
    keep the strictly positive remainder (≤ k entries survive). Each
    trim discards ≥ (k+1)·m count units for a per-entry decrement of
    m, so the total decrement any token suffers is ≤ n_part/(k+1) —
    the same superset guarantee as the element-at-a-time update, with
    Python work O(unique-per-batch) instead of O(tokens)."""

    def summarize(batches):
        import pandas as pd

        counters = None  # pd.Series: token -> residual count
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            # exact per-batch summary folded by the MG merge rule
            counters = mg_fold(counters, pdf["tok"].value_counts(), k)
        toks = [] if counters is None else list(counters.index)
        cnts = [] if counters is None else [int(c) for c in counters]
        # the summary also carries this partition's row count as a
        # tok=NULL row, so the global n needs no separate full pass
        yield pd.DataFrame({"tok": toks + [None], "c": cnts + [n_part]})

    return summarize


def heavy_hitters(
    toks: DataFrame, k: int = HH_K
) -> DataFrame:
    """Exact tokens with count > n/k, found via the two-pass
    sketch-then-verify plan (pass 1: sketch, which also carries the
    per-partition row counts so n needs no extra scan; pass 2:
    candidate-only exact re-count). `toks` must have a string column
    `tok` with no nulls (the null slot is the count marker)."""
    summaries = toks.mapInPandas(
        _mg_partial(k), schema="tok string, c long"
    ).collect()
    n = sum(r["c"] for r in summaries if r["tok"] is None)
    cand_list = sorted({r["tok"] for r in summaries if r["tok"] is not None})
    spark = toks.sparkSession
    cands = spark.createDataFrame([(t,) for t in cand_list], "tok string")
    exact = (
        toks.join(F.broadcast(cands), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # integer-exact threshold: cnt * k > n (no float division)
        .filter(F.col("cnt") * F.lit(k) > F.lit(n))
    )
    return exact.withColumn("n_total", F.lit(n)).orderBy("tok")


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokens exceeding 1/HH_K of all token occurrences —
    sketch-pruned, exactly re-counted, hash-equal to the oracle's
    plain GROUP BY / HAVING over the full token stream."""
    # r17: widen_scan was TRIED here and measured SLOWER (1.37 →
    # 1.63 s warm min, interleaved A/B at sf0.1): the raw-text
    # exchange plus 32 per-partition MG summaries (bigger candidate
    # union, more Python workers) costs more than the single-core
    # explode saves on this corpus. Left on the scan partitioning.
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return heavy_hitters(toks, HH_K)


Q_HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
n AS (SELECT count(*) AS n_total FROM toks)
SELECT tok, count(*) AS cnt, (SELECT n_total FROM n) AS n_total
FROM toks
GROUP BY tok
HAVING count(*) * {HH_K} > (SELECT n_total FROM n)
ORDER BY tok
"""
