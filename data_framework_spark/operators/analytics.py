"""Event-sequence analytics: ordered funnels and rolling-window
anomaly detection.

Extension layer (SURVEY.md §7 phase 5) — the event-log counterparts
of the corpus diagnostics: a STRICTLY-ORDERED conversion funnel
(each stage's timestamp must come after the previous stage's — the
semantics product funnels actually need, not mere set membership)
and per-series rolling z-score anomaly flags (the windowed version
of the reference's global 3σ threshold, vpicdataset.py:486-487 —
a level shift that global σ misses is obvious against a trailing
window).

Scale shapes: the funnel is one filtered conditional-min aggregate
per stage, each shuffling on user_id — on a user-bucketed event
table all four stages are co-located, no cross-key traffic. The
anomaly scan is a single window pass per (user) series plus one
rollup; the window frame is row-bounded (trailing W events), so
state per series is constant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table

FUNNEL_STAGES = ["signup", "view", "click", "purchase"]

ZS_WINDOW = 20  # trailing events per series
ZS_MIN_PRIOR = 10  # require this many prior events before scoring
ZS_SIGMA = 3.0


def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel over events: users whose first
    'signup' precedes a 'view' precedes a 'click' precedes a
    'purchase' (each stage's qualifying event must be strictly after
    the previous stage's chosen timestamp, taking each stage's
    EARLIEST qualifying event). One row: per-stage user counts and
    step conversion rates."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    # r17 optimization (guide §2.4 — remove shuffles outright): the
    # former stage-by-stage form paid 4 persist+count barrier jobs and
    # 4 user-keyed shuffles (each stage a filter → join-to-previous →
    # groupBy-min). The strictly-ordered funnel is per-user local, so
    # ONE user-keyed aggregate collects each stage's candidate
    # timestamps (sorted arrays; bounded by a user's own event count —
    # the standard sessionization shape) and the stage recurrence
    # t_k = min{ts ∈ stage_k | ts > t_{k-1}} evaluates as HOF
    # filter/array_min on the same row: 1 shuffle + 1 global reduce,
    # no barriers. Stage semantics identical (earliest qualifying
    # event, strict >; NULL t_{k-1} propagates to an empty filter →
    # NULL t_k, exactly the old join's absent row). Parity pinned at
    # sf0.001/0.01/0.1 (tests/test_round17.py); measured 2.32 →
    # 0.94 s warm min at sf0.1 (interleaved A/B).
    s1, s2, s3, s4 = FUNNEL_STAGES
    per_user = (
        ev.filter(F.col("event_type").isin(*FUNNEL_STAGES))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == s1, F.col("ts"))
            ).alias("t1"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("event_type") == s2, F.col("ts"))
                )
            ).alias("a2"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("event_type") == s3, F.col("ts"))
                )
            ).alias("a3"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("event_type") == s4, F.col("ts"))
                )
            ).alias("a4"),
        )
    )
    stg = (
        per_user.withColumn(
            "t2", F.array_min(F.filter("a2", lambda x: x > F.col("t1")))
        )
        .withColumn(
            "t3", F.array_min(F.filter("a3", lambda x: x > F.col("t2")))
        )
        .withColumn(
            "t4", F.array_min(F.filter("a4", lambda x: x > F.col("t3")))
        )
    )
    # rates are rounded by SPARK's F.round (HALF_UP, matching DuckDB's
    # round), not Python round() (HALF_EVEN — a representable 4dp
    # midpoint like 1/32 would diverge the hash); empty-stage
    # denominators yield 0.0 via the same CASE guard the oracle uses
    base = stg.agg(
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_view"),
        F.count("t3").alias("n_click"),
        F.count("t4").alias("n_purchase"),
    )

    def rate(num: str, den: str) -> Column:
        return F.when(F.col(den) == 0, F.lit(0.0)).otherwise(
            F.round(F.col(num) / F.col(den).cast("double"), 4)
        )

    return base.select(
        "n_signup",
        "n_view",
        "n_click",
        "n_purchase",
        rate("n_view", "n_signup").alias("conv_view"),
        rate("n_click", "n_view").alias("conv_click"),
        rate("n_purchase", "n_click").alias("conv_purchase"),
    )


Q_FUNNEL_STAGES_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = 'view' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
, n AS (
  SELECT (SELECT count(*) FROM s1) AS n1,
         (SELECT count(*) FROM s2) AS n2,
         (SELECT count(*) FROM s3) AS n3,
         (SELECT count(*) FROM s4) AS n4
)
SELECT n1 AS n_signup, n2 AS n_view, n3 AS n_click, n4 AS n_purchase,
       CASE WHEN n1 = 0 THEN 0.0
            ELSE round(n2 / n1::DOUBLE, 4) END AS conv_view,
       CASE WHEN n2 = 0 THEN 0.0
            ELSE round(n3 / n2::DOUBLE, 4) END AS conv_click,
       CASE WHEN n3 = 0 THEN 0.0
            ELSE round(n4 / n3::DOUBLE, 4) END AS conv_purchase
FROM n
"""


def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series rolling anomaly detection: an event is anomalous
    when its |z-score| against the TRAILING ZS_WINDOW events of the
    same user exceeds ZS_SIGMA (z rounded to 6dp before the cut so
    the boundary is engine-stable; events with fewer than
    ZS_MIN_PRIOR predecessors or zero trailing variance are not
    scored). Emits per-event_type scored/anomaly accounting — the
    windowed upgrade of the reference's global 3σ threshold."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZS_WINDOW, -1)
    )
    scored = ev.select(
        "event_type",
        F.count("value").over(w).alias("n_prior"),
        F.avg("value").over(w).alias("mu"),
        F.stddev_pop("value").over(w).alias("sd"),
        "value",
    ).filter(
        # guard at 9dp, not against exact 0: stddev_pop of a
        # degenerate all-identical window is an engine-dependent
        # cancellation residue (exactly 0 on one engine, ~1e-15 on
        # the other flips the scored-row set — the heaps_fit class);
        # rounding the GUARD only (z still divides the raw sd, whose
        # ulp noise the 6dp z-rounding absorbs) drops the window on
        # both engines identically. Unreachable on this corpus
        # (verified value-identical at all 3 SFs) — hardened for the
        # data that would hit it (round-10 review).
        (F.col("n_prior") >= ZS_MIN_PRIOR) & (F.round(F.col("sd"), 9) > 0)
    )
    z = F.round(F.abs(F.col("value") - F.col("mu")) / F.col("sd"), 6)
    return (
        scored.select("event_type", (z > ZS_SIGMA).cast("int").alias("anom"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum("anom").alias("n_anomalies"),
            F.round(F.avg(F.col("anom").cast("double")), 4).alias(
                "anomaly_rate"
            ),
        )
        .orderBy("event_type")
    )


Q_ROLLING_ZSCORE_SQL = f"""
WITH scored AS (
  SELECT event_type,
         count(value) OVER w AS n_prior,
         avg(value) OVER w AS mu,
         stddev_pop(value) OVER w AS sd,
         value
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ZS_WINDOW} PRECEDING AND 1 PRECEDING)
),
flagged AS (
  SELECT event_type,
         CASE WHEN round(abs(value - mu) / sd, 6) > {ZS_SIGMA}
              THEN 1 ELSE 0 END AS anom
  FROM scored
  WHERE n_prior >= {ZS_MIN_PRIOR} AND round(sd, 9) > 0
)
SELECT event_type,
       count(*) AS n_scored,
       sum(anom)::BIGINT AS n_anomalies,
       round(avg(anom::DOUBLE), 4) AS anomaly_rate
FROM flagged
GROUP BY event_type
ORDER BY event_type
"""
