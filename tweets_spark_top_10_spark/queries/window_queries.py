"""Event-time window queries (batch twins of the streaming pipelines).

The reference's hourly batch over hour-partition dirs IS a hand-rolled
tumbling window (``App.java:43-63``, SURVEY.md §2.2); here the same
semantics are expressed with ``F.window``/``F.session_window`` so the
identical code runs over ``readStream`` (streaming/ wires that up).
Oracles use DuckDB ``time_bucket`` / gaps-and-islands SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.queries.registry import register
from tweets_spark_top_10_spark.sources.registry import load_table


@register(
    "hourly_event_windows",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 6) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour count per event_type — the streaming top-hashtags
    aggregation in batch form (same F.window call works on readStream)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "sliding_event_windows",
    oracle="""
    WITH grids AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes')
        AS window_start FROM events
    )
    SELECT window_start, COUNT(*) AS n
    FROM grids
    GROUP BY 1
    """,
)
def sliding_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min: each event lands in 2
    windows. Spark's F.window(slide) == union of the 2 offset tumbling
    grids the oracle builds explicitly."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )


@register(
    "user_sessions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '10 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_no
      FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 10-minute inactivity gap via
    ``session_window`` — the oracle derives identical sessions with
    gaps-and-islands SQL (session_start = first event of the island)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "customer_balance_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS pr,
           ROUND(CUME_DIST() OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS cd
    FROM customer
    """,
)
def customer_balance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per segment — the distribution-position
    window functions (the remaining gap in the rank family after
    rank/dense_rank/ntile/row_number).  Both are tie-stable: equal
    balances share a value, so no tie-break column is needed for
    determinism, unlike row_number."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "user_hourly_gapfill",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
             ROUND(AVG(value), 6) AS v_obs
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1
      FROM hourly GROUP BY 1
    ), spine AS (
      SELECT user_id,
             unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    )
    SELECT s.user_id, s.bucket,
           LAST_VALUE(h.v_obs IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
           h.v_obs IS NULL AS is_gap
    FROM spine s
    LEFT JOIN hourly h ON s.user_id = h.user_id AND s.bucket = h.bucket
    """,
)
def user_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample with LOCF gap fill: bucketed averages
    on a per-key regular grid (``sequence + explode`` spine from each
    user's own [first, last] hour — never a global-calendar cross
    join), empty hours carried forward by an ordered ``last(ignore-
    nulls)`` window keyed on the same column the aggregate shuffled on.
    See ``operators/resample.py`` for the sequence-bomb guard."""
    from tweets_spark_top_10_spark.operators.resample import resample_locf

    events = load_table(spark, sf_dir, "events")
    return resample_locf(
        events, key_col="user_id", ts_col="ts", value_col="value",
        interval="1 hour",
    )


@register(
    "user_value_anomalies",
    oracle="""
    WITH scored AS (
      SELECT user_id, event_id, value,
             AVG(value) OVER w AS mu,
             STDDEV_SAMP(value) OVER w AS sd,
             COUNT(*) OVER w AS n_win
      FROM events
      WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
      )
    )
    SELECT user_id, event_id,
           ROUND((value - mu) / sd, 4) AS z
    FROM scored
    WHERE n_win >= 10 AND sd > 0 AND ABS((value - mu) / sd) > 3
    """,
)
def user_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against its
    user's TRAILING 20-event window (PRECEDING only — no peeking at
    the value being scored), flagged beyond 3 sigma once the window
    has >= 10 observations.  One keyed window, no self-join; the
    online-monitoring shape (same frame works on a stream via the
    partials table + read-side window)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    scored = events.select(
        "user_id",
        "event_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return scored.where(
        (F.col("n_win") >= 10) & (F.col("sd") > 0) & (F.abs(z) > 3)
    ).select("user_id", "event_id", F.round(z, 4).alias("z"))


@register(
    "event_value_moments",
    oracle="""
    WITH mu AS (
      SELECT event_type, AVG(value) AS m FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(CORR(value, user_id), 6) AS corr_vu,
           ROUND(COVAR_SAMP(value, user_id), 4) AS covar_vu,
           ROUND((SUM(POWER(value - m, 3)) / COUNT(*))
                 / POWER(SUM(POWER(value - m, 2)) / COUNT(*), 1.5), 6)
             AS skew_v,
           ROUND((SUM(POWER(value - m, 4)) / COUNT(*))
                 / POWER(SUM(POWER(value - m, 2)) / COUNT(*), 2) - 3, 6)
             AS kurt_v
    FROM events e JOIN mu ON mu.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def event_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher statistical aggregates (corr / covar_samp / skewness /
    kurtosis) per event type — one map-side-combinable aggregate pass;
    completes the aggregate-function surface beyond sum/avg/stddev.
    Estimator convention is part of the contract: Spark reports the
    POPULATION moment estimators (g1, excess g2) while DuckDB's
    built-ins are bias-corrected (G1, G2) — they disagreed in the
    third digit here, so the oracle replays Spark's definition from
    raw central moments instead of calling the mismatched built-in."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.corr("value", "user_id"), 6).alias("corr_vu"),
        F.round(F.covar_samp("value", "user_id"), 4).alias("covar_vu"),
        F.round(F.skewness("value"), 6).alias("skew_v"),
        F.round(F.kurtosis("value"), 6).alias("kurt_v"),
    )
