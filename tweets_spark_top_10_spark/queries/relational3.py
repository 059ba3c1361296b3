"""Third batch of relational coverage: outer-join surface, range join,
as-of join, lag/lead, pivot, grouping sets, exact percentiles, ordered
list aggregation.

The reference implements none of these (its whole dataflow is
explode→count→top-10, ``App.java:92-134``); they are part of the [EXT]
capability envelope in SURVEY.md §2.2.  Scale notes per query:

- Outer joins ride Spark's sort-merge join; the dimension sides here are
  tiny aggregates so AQE converts them to broadcast joins at runtime.
- The range join broadcasts a literal bucket dim — O(rows × buckets)
  with no shuffle of the fact side.
- The as-of join deliberately avoids the naive
  ``join on key + filter + row_number`` (which explodes to an O(n·m)
  intermediate per key); it is the union + ordered-window formulation:
  one shuffle on the key, one sort, O(n+m) rows total.  This is the
  standard scalable as-of (cf. pandas merge_asof semantics, financial
  trades/quotes).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.text import tokenize
from tweets_spark_top_10_spark.queries.registry import register
from tweets_spark_top_10_spark.sources.registry import load_table


@register(
    "nation_activity_full_outer",
    oracle="""
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           c.n_cust, s.n_supp
    FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
          FROM customer WHERE c_mktsegment = 'BUILDING'
          GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
          FROM supplier WHERE s_acctbal > 8000
          GROUP BY 1) s
    ON c.nationkey = s.nationkey
    """,
)
def nation_activity_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two filtered per-nation aggregates (either side
    may be missing a nation → NULL counts survive)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 8000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, "nationkey", "full_outer").select(
        "nationkey", "n_cust", "n_supp"
    )


@register(
    "customer_order_counts_right",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def customer_order_counts_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join: order counts per customer *including* customers
    with zero orders (COUNT of a NULL column → 0)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "part_lineitem_left",
    oracle="""
    SELECT p_partkey, COUNT(l_orderkey) AS n_lines,
           ROUND(COALESCE(SUM(l_extendedprice), 0.0), 4) AS revenue
    FROM part LEFT JOIN lineitem ON l_partkey = p_partkey
    GROUP BY p_partkey
    """,
)
def part_lineitem_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join: per-part lineitem stats keeping never-ordered
    parts (NULL-side aggregates collapse to 0)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, li.l_partkey == part.p_partkey, "left")
        .groupBy("p_partkey")
        .agg(
            F.count("l_orderkey").alias("n_lines"),
            F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)), 4).alias(
                "revenue"
            ),
        )
    )


@register(
    "quantity_bucket_ranges",
    oracle="""
    SELECT b.bucket, COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 4) AS revenue
    FROM lineitem l
    JOIN (VALUES (0.0, 10.0, 'q00_10'), (10.0, 20.0, 'q10_20'),
                 (20.0, 30.0, 'q20_30'), (30.0, 40.0, 'q30_40'),
                 (40.0, 60.0, 'q40_60')) AS b(lo, hi, bucket)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.bucket
    """,
)
def quantity_bucket_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join of the fact table into a literal bucket
    dimension.  The dim is broadcast, so the fact side never shuffles for
    the join — the only shuffle is the final 5-group aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    buckets = spark.createDataFrame(
        [
            (0.0, 10.0, "q00_10"),
            (10.0, 20.0, "q10_20"),
            (20.0, 30.0, "q20_30"),
            (30.0, 40.0, "q30_40"),
            (40.0, 60.0, "q40_60"),
        ],
        "lo double, hi double, bucket string",
    )
    return (
        li.join(
            F.broadcast(buckets),
            (li.l_quantity >= buckets.lo) & (li.l_quantity < buckets.hi),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
        )
    )


@register(
    "purchase_last_view_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, v.ts AS last_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def purchase_last_view_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the most recent view by the same
    user at-or-before the purchase timestamp (NULL if none).

    Scalable formulation: tag both streams, UNION, one window sorted by
    (ts, side) per user, then ``last(view_ts, ignorenulls)`` carries the
    latest view forward.  O(n+m) rows, single shuffle on user_id — never
    materializes the per-key cross product.
    """
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("view_ts"),
        F.lit(0).alias("is_query"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("view_ts"),
        F.lit(1).alias("is_query"),
    )
    # At equal ts the view sorts first (is_query asc), so "at-or-before"
    # includes same-instant views — matching ASOF's >= semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_query")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        views.unionByName(purchases)
        .withColumn("last_view_ts", F.last("view_ts", ignorenulls=True).over(w))
        .filter(F.col("is_query") == 1)
        .select("event_id", "user_id", "ts", "last_view_ts")
    )


@register(
    "event_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(ts) OVER w AS prev_ts,
           ROUND(LEAD(value) OVER w, 6) AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def event_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event-time order (deterministic tie-break
    on event_id)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.round(F.lead("value").over(w), 6).alias("next_value"),
    )


@register(
    "priority_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide counts per status).  Pivot values are listed
    explicitly — at scale an unlisted pivot forces an extra distinct-scan
    job to discover them."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


@register(
    "status_priority_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 4) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def status_priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("revenue"),
    )


@register(
    "quantity_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75,
           ROUND(quantile_cont(l_extendedprice, 0.90), 6) AS price_p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated per-group percentiles (== DuckDB
    ``quantile_cont``), computed by ``grouped_exact_quantiles`` instead
    of the builtin grouped ``percentile`` (r17, guide §5): the builtin
    holds each group's ENTIRE value column inside one aggregation
    buffer — with 3 return-flag groups at 100 TB that is N/3 doubles
    per buffer, the same single-buffer cliff ``approx_quantile_gate``
    escaped in r16.  The operator replays the builtin's interpolation
    arithmetic bit-for-bit (verified identical doubles at
    sf0.001/0.01/0.1), so emitted values are unchanged.  At 100 TB the
    sketch posture (``approx_percentile``) remains available, but it
    has no cross-engine oracle; the exact form is the correctness
    anchor."""
    from tweets_spark_top_10_spark.operators.scalable_rank import (
        grouped_exact_quantiles_multi,
    )

    li = load_table(spark, sf_dir, "lineitem")
    qs = grouped_exact_quantiles_multi(
        li,
        ["l_returnflag"],
        [
            ("l_quantity", [(0.25, "__q0"), (0.50, "__q1"), (0.75, "__q2")]),
            ("l_extendedprice", [(0.90, "__p0")]),
        ],
    )
    return qs.select(
        "l_returnflag",
        F.round("__q0", 6).alias("p25"),
        F.round("__q1", 6).alias("p50"),
        F.round("__q2", 6).alias("p75"),
        F.round("__p0", 6).alias("price_p90"),
    )


@register(
    "user_trailing_hour_value",
    oracle="""
    SELECT event_id, user_id, ts,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ), 6) AS trailing_1h_value
    FROM events
    """,
)
def user_trailing_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time (trailing 1 hour per user) — the
    value-based frame spec, vs user_running_value's ROWS frame.  Ordered
    by epoch micros so the range bound is an exact integer interval on
    both engines."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 6).alias("trailing_1h_value"),
    )


@register(
    "orders_profile",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_prices,
           ROUND(MIN(o_totalprice), 4) AS min_price,
           ROUND(MAX(o_totalprice), 4) AS max_price,
           MIN(o_orderdate) AS min_date,
           MAX(o_orderdate) AS max_date
    FROM orders
    """,
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling in one pass: row/distinct/null counts and value
    ranges — the validation gate a pipeline runs before trusting a new
    table drop.  One scan, one 1-row aggregate, no shuffle of note."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias(
            "null_prices"
        ),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


@register(
    "deterministic_sample_stats",
    oracle="""
    SELECT COUNT(*) AS n_sampled,
           ROUND(SUM(o_totalprice), 4) AS sampled_revenue
    FROM orders
    WHERE (ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) * 256
           + ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))) % 10 = 0
    """,
)
def deterministic_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample via content hash (md5 of the key), not
    ``sample()`` — reproducible across engines, runs, and partitionings,
    which is what a training-data pipeline needs for held-out splits.
    The predicate pushes to the scan; no shuffle until the 1-row agg."""
    orders = load_table(spark, sf_dir, "orders")
    h = F.md5(F.col("o_orderkey").cast("string"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 10
    return orders.filter(bucket == 0).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.sum("o_totalprice"), 4).alias("sampled_revenue"),
    )


@register(
    "customer_priority_lists",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderpriority)), '|') AS priorities,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def customer_priority_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list + sort_array: multiset aggregation with deterministic
    order (collect_list alone is partition-order-nondeterministic —
    never compare it unsorted).  Emitted '|'-joined so the driver's
    pandas canonicalizer can hash the cell (raw lists are unhashable)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_list("o_orderpriority")), "|").alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "urgent_vs_customer_avg_sql",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(o_totalprice * (SELECT COUNT(*) FROM orders o2
                                 WHERE o2.o_custkey = o.o_custkey)
                 - (SELECT SUM(o3.o_totalprice) FROM orders o3
                    WHERE o3.o_custkey = o.o_custkey), 2)
             AS scaled_diff_vs_cust_avg
    FROM orders o
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def urgent_vs_customer_avg_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``spark.sql`` entrypoint with two CORRELATED SCALAR
    SUBQUERIES — the one SQL shape the rest of the catalog expresses
    via windows or joins.  Catalyst decorrelates them into aggregates +
    joins (no per-row re-execution — RewriteCorrelatedScalarSubquery),
    so the declarative form costs the same as the hand-written one at
    any scale.  Every other catalog query uses the DataFrame API; this
    one pins the SQL surface itself, oracle = the identical statement.

    The emitted value is ``price*n - sum`` (same sign as price - avg)
    rather than price - AVG: with 2-decimal prices the scaled diff is
    an exact multiple of 0.01, while price - avg lands on .xxx5
    half-way points whose rounding direction differs between engines
    (observed: thousands of one-ulp mismatches at round 4)."""
    # A uniquely-named view, dropped once the plan is analyzed: naming
    # it plain 'orders' would mutate shared session catalog state, and
    # any later spark.sql in the same session would silently resolve
    # 'orders' to this sf_dir's table.  spark.sql analyzes eagerly, so
    # the returned DataFrame keeps its resolved plan after the drop.
    view = "orders_q_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            SELECT o_orderkey, o_custkey,
                   ROUND(o_totalprice * (SELECT COUNT(*) FROM {view} o2
                                         WHERE o2.o_custkey = o.o_custkey)
                         - (SELECT SUM(o3.o_totalprice) FROM {view} o3
                            WHERE o3.o_custkey = o.o_custkey), 2)
                     AS scaled_diff_vs_cust_avg
            FROM {view} o
            WHERE o_orderpriority = '1-URGENT'
            """
        )
    finally:
        spark.catalog.dropTempView(view)


@register(
    "approx_quantile_gate",
    oracle="""
    SELECT ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50_exact,
           TRUE AS p50_in_band,
           ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS p90_exact,
           TRUE AS p90_in_band
    FROM lineitem
    """,
)
def approx_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percentile_approx`` (KLL-style sketch) under an invariant gate —
    the cardinality-sketch pattern (``approx_distinct_users``) applied
    to quantiles.  Exact percentiles need a full sort/shuffle of the
    column; the sketch is the 100 TB path, but its value is
    engine-specific, so the driver-checkable claim is its CONTRACT: at
    accuracy=10000 the rank error is <=1e-4, far inside the
    [q-0.01, q+0.01] exact-quantile band checked here.  The query emits
    the exact percentiles (which DuckDB replays) plus the in-band
    booleans the oracle asserts."""
    from tweets_spark_top_10_spark.operators.scalable_rank import (
        exact_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem")
    # Exact side: distributed order statistics (range sort + rank
    # probe, operators/scalable_rank.exact_quantiles) instead of the
    # builtin `percentile`, which buffers the FULL column in one
    # aggregation buffer — the guide §5 single-buffer cliff, and 2.5s
    # of the 3.8s query wall at sf0.1 (r16: 1.5s distributed,
    # bit-identical doubles at every SF).  One sketch for both approx
    # quantiles, same 10000-accuracy contract as before.
    exact = exact_quantiles(
        li,
        "l_extendedprice",
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        [0.49, 0.50, 0.51, 0.89, 0.90, 0.91],
    )
    approx = li.agg(
        F.expr(
            "percentile_approx(l_extendedprice, array(0.50, 0.90), 10000)"
        ).alias("a")
    )
    # 1-row x 1-row assembly (the simhash_invariants precedent).
    return approx.crossJoin(exact).select(
        F.round(F.col("e1"), 4).alias("p50_exact"),
        (
            (F.col("a")[0] >= F.col("e0")) & (F.col("a")[0] <= F.col("e2"))
        ).alias("p50_in_band"),
        F.round(F.col("e4"), 4).alias("p90_exact"),
        (
            (F.col("a")[1] >= F.col("e3")) & (F.col("a")[1] <= F.col("e5"))
        ).alias("p90_in_band"),
    )


@register(
    "lateral_top2_orders_sql",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2
    ) o
    """,
)
def lateral_top2_orders_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (SQL surface): top-2 orders per
    customer, declared as a per-row subquery instead of the catalog's
    usual window formulation (``top_orders_per_customer``).  Catalyst
    rewrites the lateral into a join + per-group limit
    (DecorrelateInnerQuery) — no per-customer re-execution — so the
    declarative form scales like the window one; the oracle runs the
    identical statement shape on DuckDB's native LATERAL."""
    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    cview, oview = f"customer_l_{suffix}", f"orders_l_{suffix}"
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(cview)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(oview)
    try:
        return spark.sql(
            f"""
            SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
            FROM {cview} c,
            LATERAL (
              SELECT o_orderkey, o_totalprice FROM {oview}
              WHERE o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2
            ) o
            """
        )
    finally:
        spark.catalog.dropTempView(cview)
        spark.catalog.dropTempView(oview)


@register(
    "event_props_variant",
    oracle="""
    SELECT CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
             AS k_mod,
           COUNT(*) AS n,
           ROUND(AVG(value), 4) AS avg_value
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL
    GROUP BY 1
    """,
)
def event_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): ``parse_json`` once
    into a variant column, typed extraction via ``variant_get`` —
    the open-schema path for JSON event payloads (vs the closed
    ``from_json`` map in ``props_map_access``).  At scale variant
    columns store shredded binary (no per-query re-parse) and the
    extraction is a codegen'd path access.  Oracle: DuckDB JSON
    extraction of the same field."""
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        events.withColumn("__k", k)
        .filter(F.col("__k").isNotNull())
        .groupBy((F.col("__k") % 10).cast("long").alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


@register(
    "mergeable_user_sketches",
    oracle="""
    SELECT event_type AS key,
           COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS in_band
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL', COUNT(DISTINCT user_id), TRUE FROM events
    UNION ALL
    SELECT 'CLICK_AND_VIEW', COUNT(*), TRUE FROM (
      SELECT user_id FROM events WHERE event_type IN ('click', 'view')
      GROUP BY user_id HAVING COUNT(DISTINCT event_type) = 2
    )
    """,
)
def mergeable_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE cardinality sketches (Apache Datasketches surface,
    Spark 4): per-event-type HLL sketches of the user set, re-unioned
    with ``hll_union_agg`` into the global estimate, plus a Theta
    intersection estimate (users who did BOTH click and view) — set
    EXPRESSIONS over sketches, which plain HLL cannot do.

    Mergeability is the 100 TB property: sketch each partition/hour
    once, union the <=4 KB sketch blobs later — re-aggregation never
    rescans the data (the lambda-architecture fix for the reference's
    recompute-the-hour design).  Sketch estimates are
    datasketches-specific, so the driver-checkable claim is the
    CONTRACT: each estimate lands within 5% of the exact count (HLL
    lgK=12 error is ~1.6%; exact at these fixture cardinalities).
    Output: (key, n_exact, in_band) for each type + ALL + the
    intersection, all value-replayed exactly by the oracle."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n"),
    )
    est = F.hll_sketch_estimate("sk")
    per = sk.select(
        F.col("event_type").alias("key"),
        F.col("n").alias("n_exact"),
        (F.abs(est - F.col("n")) <= 0.05 * F.col("n")).alias("in_band"),
    )
    tot_exact = ev.agg(F.count_distinct("user_id").alias("n"))
    tot_est = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("est")
    )
    all_row = tot_exact.crossJoin(tot_est).select(
        F.lit("ALL").alias("key"),
        F.col("n").alias("n_exact"),
        (F.abs(F.col("est") - F.col("n")) <= 0.05 * F.col("n")).alias(
            "in_band"
        ),
    )
    both = ev.filter(F.col("event_type").isin("click", "view"))
    inter_exact = (
        both.groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("c"))
        .filter(F.col("c") == 2)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    inter_est = (
        both.groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("t"))
        .agg(
            F.theta_sketch_estimate(
                F.theta_intersection_agg(F.col("t"))
            ).alias("est")
        )
    )
    inter_row = inter_exact.crossJoin(inter_est).select(
        F.lit("CLICK_AND_VIEW").alias("key"),
        F.col("n").alias("n_exact"),
        (F.abs(F.col("est") - F.col("n")) <= 0.05 * F.col("n")).alias(
            "in_band"
        ),
    )
    return per.unionByName(all_row).unionByName(inter_row)


@register(
    "user_latest_event",
    oracle="""
    SELECT user_id, event_id, ts, event_type, ROUND(value, 6) AS value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS r
      FROM events
    ) WHERE r = 1
    """,
)
def user_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state compaction (SCD-type-1): one row per user — the
    newest event by (ts, event_id).  Implemented as a single
    ``max_by``-shaped hash aggregate (MAX of an ordering-prefixed
    struct), NOT a row_number window: the aggregate combines map-side,
    so each partition sends at most one row per user to the shuffle —
    at 100 TB that is the difference between shuffling the corpus and
    shuffling ~|users| rows.  The oracle states the same semantics in
    its natural SQL form (row_number = 1)."""
    ev = load_table(spark, sf_dir, "events")
    best = F.max(
        F.struct(
            F.col("ts"), F.col("event_id"), F.col("event_type"), F.col("value")
        )
    ).alias("b")
    return (
        ev.groupBy("user_id")
        .agg(best)
        .select(
            "user_id",
            F.col("b.event_id").alias("event_id"),
            F.col("b.ts").alias("ts"),
            F.col("b.event_type").alias("event_type"),
            F.round(F.col("b.value"), 6).alias("value"),
        )
    )


@register(
    "bloom_semi_revenue",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 4) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'AUTOMOBILE'
    GROUP BY o.o_orderpriority
    """,
)
def bloom_semi_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side Bloom prefilter ahead of the exact join
    (``functions/bloom.py``): the dimension's key set is compressed to
    8 KB of broadcast bit-words and ~80% of fact rows are dropped
    before the shuffle; the exact join then removes the (rare) false
    positives, so the result — and the oracle — is the plain join.

    At 100 TB this is the pattern for dimensions too big to broadcast
    as rows but whose keys fit a Bloom filter; here the dimension is
    small, which is what lets the oracle stay a plain SQL join."""
    from tweets_spark_top_10_spark.functions.bloom import bloom_prefilter

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    orders = load_table(spark, sf_dir, "orders")
    filtered = bloom_prefilter(
        orders, "o_custkey", cust.select("c_custkey"), "c_custkey"
    )
    return (
        filtered.join(cust.select("c_custkey"), filtered.o_custkey == F.col("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
    )


@register(
    "orders_cdc_merge",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
    ), changes AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
             o_orderpriority, 'U' AS op, 1 AS seq
      FROM base WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice * CAST(2 AS DOUBLE), o_orderpriority, 'U', 0
      FROM base WHERE o_orderkey % 10 = 7
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderpriority, 'D', 1
      FROM base WHERE o_orderkey % 10 = 7
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N',
             CAST(999.99 AS DOUBLE), '1-URGENT', 'I', 1
      FROM base WHERE o_orderkey % 100 = 1
    ), latest AS (
      SELECT * FROM (
        SELECT c.*, ROW_NUMBER() OVER (
          PARTITION BY o_orderkey ORDER BY seq DESC, op DESC) AS rn
        FROM changes c
      ) WHERE rn = 1
    )
    SELECT
      COALESCE(l.o_orderkey, b.o_orderkey) AS o_orderkey,
      CASE WHEN l.op IS NOT NULL THEN l.o_custkey ELSE b.o_custkey END AS o_custkey,
      CASE WHEN l.op IS NOT NULL THEN l.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
      ROUND(CASE WHEN l.op IS NOT NULL THEN l.o_totalprice ELSE b.o_totalprice END, 4) AS o_totalprice,
      CASE WHEN l.op IS NOT NULL THEN l.o_orderpriority ELSE b.o_orderpriority END AS o_orderpriority
    FROM base b FULL OUTER JOIN latest l ON b.o_orderkey = l.o_orderkey
    WHERE l.op IS NULL OR l.op <> 'D'
    """,
)
def orders_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CDC MERGE (``operators/merge.py``): a deterministic change
    feed — stale update (seq 0) superseded by a delete (seq 1) on the
    same keys, an update set, and an insert set — applied onto the
    orders snapshot with last-writer-wins.  The oracle replays the
    same feed in SQL (row_number compaction + full-outer apply)."""
    from tweets_spark_top_10_spark.operators.merge import apply_changes

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    k = F.col("o_orderkey")
    upd = (
        base.where(k % 10 == 3)
        .withColumn("o_totalprice", F.col("o_totalprice") * F.lit(1.1))
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(1))
    )
    stale = (
        base.where(k % 10 == 7)
        .withColumn("o_totalprice", F.col("o_totalprice") * F.lit(2.0))
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(0))
    )
    dels = (
        base.where(k % 10 == 7).withColumn("op", F.lit("D")).withColumn("seq", F.lit(1))
    )
    ins = (
        base.where(k % 100 == 1)
        .withColumn("o_orderkey", k + F.lit(100000000))
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("o_totalprice", F.lit(999.99))
        .withColumn("o_orderpriority", F.lit("1-URGENT"))
        .withColumn("op", F.lit("I"))
        .withColumn("seq", F.lit(1))
    )
    changes = upd.unionByName(stale).unionByName(dels).unionByName(ins)
    merged = apply_changes(base, changes, "o_orderkey")
    return merged.withColumn("o_totalprice", F.round("o_totalprice", 4))


@register(
    "orders_quality_audit",
    oracle="""
    SELECT 'o_custkey_not_null' AS check_name,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_positive',
           CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus_domain',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL
                         OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_upper_bound',
           CAST(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_custkey_references_customer', CAST(COUNT(*) AS BIGINT)
    FROM orders o
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
    WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
    UNION ALL
    SELECT 'o_orderkey_unique', CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
    """,
)
def orders_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint audit (``functions/quality.py``): four
    row-local checks fused into ONE aggregate pass, an anti-join
    referential check (the optimizer broadcasts the key set while it
    fits — customer scales with SF, so no hard hint), and a keyed
    uniqueness check — the Deequ/dbt-test shape a 100 TB ingest gates
    on."""
    from tweets_spark_top_10_spark.functions.quality import (
        audit,
        referential_violations,
        row_local_violations,
        uniqueness_violations,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    st = F.col("o_orderstatus")
    row_local = row_local_violations(
        orders,
        {
            "o_custkey_not_null": F.col("o_custkey").isNull(),
            "o_totalprice_positive": F.col("o_totalprice").isNull()
            | (F.col("o_totalprice") <= 0),
            "o_orderstatus_domain": st.isNull() | ~st.isin("O", "F", "P"),
            "o_totalprice_upper_bound": F.col("o_totalprice") > 300000,
        },
    )
    return audit(
        row_local,
        referential_violations(
            orders, "o_custkey", cust, "c_custkey", "o_custkey_references_customer"
        ),
        uniqueness_violations(orders, "o_orderkey", "o_orderkey_unique"),
    )


@register(
    "orders_snapshot_diff",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
    ), snap AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 10 = 3
                  THEN o_totalprice * CAST(1.1 AS DOUBLE)
                  ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM base WHERE o_orderkey % 10 <> 7
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N',
             CAST(999.99 AS DOUBLE), '1-URGENT'
      FROM base WHERE o_orderkey % 100 = 1
    )
    SELECT
      CASE WHEN b.o_orderkey IS NULL THEN 'I'
           WHEN n.o_orderkey IS NULL THEN 'D'
           ELSE 'U' END AS op,
      COALESCE(n.o_orderkey, b.o_orderkey) AS o_orderkey,
      CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_custkey ELSE b.o_custkey END AS o_custkey,
      CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
      ROUND(CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_totalprice ELSE b.o_totalprice END, 4) AS o_totalprice,
      CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_orderpriority ELSE b.o_orderpriority END AS o_orderpriority
    FROM base b FULL OUTER JOIN snap n ON b.o_orderkey = n.o_orderkey
    WHERE b.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR b.o_custkey      IS DISTINCT FROM n.o_custkey
       OR b.o_orderstatus  IS DISTINCT FROM n.o_orderstatus
       OR b.o_totalprice   IS DISTINCT FROM n.o_totalprice
       OR b.o_orderpriority IS DISTINCT FROM n.o_orderpriority
    """,
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing (``operators/merge.snapshot_diff``): two
    deterministic snapshot states of orders — deletes, price updates,
    inserts — reduced to the effective I/U/D change feed.  The
    inverse of ``orders_cdc_merge``'s apply; output is churn-sized,
    not snapshot-sized."""
    from tweets_spark_top_10_spark.operators.merge import snapshot_diff

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    k = F.col("o_orderkey")
    snap = (
        base.where(k % 10 != 7)
        .withColumn(
            "o_totalprice",
            F.when(k % 10 == 3, F.col("o_totalprice") * F.lit(1.1)).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            base.where(k % 100 == 1)
            .withColumn("o_orderkey", k + F.lit(100000000))
            .withColumn("o_orderstatus", F.lit("N"))
            .withColumn("o_totalprice", F.lit(999.99))
            .withColumn("o_orderpriority", F.lit("1-URGENT"))
        )
    )
    diff = snapshot_diff(base, snap, "o_orderkey")
    return diff.withColumn("o_totalprice", F.round("o_totalprice", 4))


@register(
    "orders_scd2_history",
    oracle="""
    WITH changes AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, 'I' AS op, 0 AS seq
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, 'F', o_totalprice * CAST(1.05 AS DOUBLE), 'U', 1
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice, 'D', 2
      FROM orders WHERE o_orderkey % 20 = 0
    ), closed AS (
      SELECT c.*,
             LEAD(seq) OVER (PARTITION BY o_orderkey ORDER BY seq ASC, op ASC) AS next_seq
      FROM changes c
    )
    SELECT o_orderkey, o_orderstatus,
           ROUND(o_totalprice, 4) AS o_totalprice,
           CAST(seq AS INT) AS valid_from,
           CAST(next_seq AS INT) AS valid_to,
           next_seq IS NULL AS is_current
    FROM closed WHERE op <> 'D'
    """,
)
def orders_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 historization (``operators/merge.scd2_history``): a
    deterministic three-wave change feed (insert, price/status update,
    delete on nested key subsets) becomes interval-versioned history —
    deleted keys' last version is closed but NOT current, updated keys
    carry two versions, insert-only keys one open version."""
    from tweets_spark_top_10_spark.operators.merge import scd2_history

    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    ins = base.where(k % 5 == 0).withColumns(
        {"op": F.lit("I"), "seq": F.lit(0)}
    )
    upd = (
        base.where(k % 10 == 0)
        .withColumns(
            {
                "o_orderstatus": F.lit("F"),
                "o_totalprice": F.col("o_totalprice") * F.lit(1.05),
                "op": F.lit("U"),
                "seq": F.lit(1),
            }
        )
    )
    dels = base.where(k % 20 == 0).withColumns(
        {"op": F.lit("D"), "seq": F.lit(2)}
    )
    hist = scd2_history(ins.unionByName(upd).unionByName(dels), "o_orderkey")
    return hist.withColumn("o_totalprice", F.round("o_totalprice", 4))


@register(
    "concurrent_part_shipments",
    oracle="""
    WITH iv AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate AS s,
             l_shipdate + CAST(l_quantity AS INT) * INTERVAL 1 DAY AS e
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
    )
    SELECT a.l_partkey AS partkey,
           a.l_orderkey AS a_orderkey, a.l_linenumber AS a_linenumber,
           b.l_orderkey AS b_orderkey, b.l_linenumber AS b_linenumber,
           CAST(EXTRACT(EPOCH FROM (LEAST(a.e, b.e) - GREATEST(a.s, b.s)))
                AS BIGINT) AS overlap_secs
    FROM iv a JOIN iv b
      ON a.l_partkey = b.l_partkey
     AND (a.l_orderkey, a.l_linenumber) < (b.l_orderkey, b.l_linenumber)
     AND a.s <= b.e AND b.s <= a.e
    """,
)
def concurrent_part_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap self-join WITHOUT a nested-loop theta join:
    pairs of 1995 lineitems of the same part whose shipping windows
    [shipdate, shipdate + quantity days] overlap.

    The operator (``operators/interval_join.py``) quantizes time into
    30-day buckets, EQUI-joins on (partkey, bucket), closes with the
    exact overlap predicate, and claims each pair only in the bucket
    of the later start (no distinct).  The oracle is the naive theta
    join — same pairs, proving the bucketing loses and duplicates
    nothing."""
    from tweets_spark_top_10_spark.operators.interval_join import (
        interval_overlap_join,
    )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            F.col("l_shipdate").alias("s"),
            (
                F.col("l_shipdate")
                + F.make_interval(days=F.col("l_quantity").cast("int"))
            ).alias("e"),
        )
    )
    a = li.select(
        F.col("l_partkey").alias("partkey"),
        F.col("l_orderkey").alias("a_orderkey"),
        F.col("l_linenumber").alias("a_linenumber"),
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
    )
    b = li.select(
        F.col("l_partkey").alias("b_partkey"),
        F.col("l_orderkey").alias("b_orderkey"),
        F.col("l_linenumber").alias("b_linenumber"),
        F.col("s").alias("b_s"),
        F.col("e").alias("b_e"),
    )
    pairs = interval_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e",
        on=[("partkey", "b_partkey")], bucket_seconds=30 * 86400,
    ).where(
        F.struct("a_orderkey", "a_linenumber")
        < F.struct("b_orderkey", "b_linenumber")
    )
    return pairs.select(
        "partkey",
        "a_orderkey",
        "a_linenumber",
        "b_orderkey",
        "b_linenumber",
        (
            F.unix_timestamp(F.least("a_e", "b_e"))
            - F.unix_timestamp(F.greatest("a_s", "b_s"))
        ).alias("overlap_secs"),
    )


@register(
    "orders_pit_lookup",
    oracle="""
    WITH changes AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, 'I' AS op, 0 AS seq
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, 'F', o_totalprice * CAST(1.05 AS DOUBLE), 'U', 1
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice, 'D', 2
      FROM orders WHERE o_orderkey % 20 = 0
    ), closed AS (
      SELECT c.*,
             LEAD(seq) OVER (PARTITION BY o_orderkey ORDER BY seq ASC, op ASC)
               AS next_seq
      FROM changes c
    ), hist AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             seq AS valid_from, next_seq AS valid_to
      FROM closed WHERE op <> 'D'
    ), probe AS (
      SELECT o_orderkey, CAST(o_orderkey % 3 AS INT) AS at
      FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT p.o_orderkey, p.at, h.o_orderstatus,
           ROUND(h.o_totalprice, 4) AS o_totalprice,
           CAST(h.valid_from AS INT) AS valid_from
    FROM probe p JOIN hist h ON p.o_orderkey = h.o_orderkey
    WHERE h.valid_from <= p.at
      AND (h.valid_to IS NULL OR p.at < h.valid_to)
    """,
)
def orders_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against SCD2 history
    (``operators/merge.pit_join``): probes at as-of positions 0/1/2
    pick the version valid THEN — updated keys resolve to version 0
    or 1 by probe time, deleted keys at position 2 fall in no interval
    and drop (no feature leakage from future versions)."""
    from tweets_spark_top_10_spark.operators.merge import pit_join, scd2_history

    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    ins = base.where(k % 5 == 0).withColumns({"op": F.lit("I"), "seq": F.lit(0)})
    upd = base.where(k % 10 == 0).withColumns(
        {
            "o_orderstatus": F.lit("F"),
            "o_totalprice": F.col("o_totalprice") * F.lit(1.05),
            "op": F.lit("U"),
            "seq": F.lit(1),
        }
    )
    dels = base.where(k % 20 == 0).withColumns({"op": F.lit("D"), "seq": F.lit(2)})
    hist = scd2_history(
        ins.unionByName(upd).unionByName(dels), "o_orderkey"
    ).drop("is_current")
    probe = orders.where(k % 5 == 0).select(
        "o_orderkey", (k % 3).cast("int").alias("at")
    )
    out = pit_join(probe, hist, "o_orderkey", "at")
    return out.select(
        "o_orderkey",
        "at",
        "o_orderstatus",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        F.col("valid_from").cast("int").alias("valid_from"),
    )


@register(
    "priority_revenue_ivm",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), changes AS (
      SELECT o_orderkey, o_orderpriority, cents * 3 AS cents, 'U' AS op, 1 AS seq
      FROM base WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT o_orderkey, o_orderpriority, cents * 2, 'U', 0
      FROM base WHERE o_orderkey % 10 = 7
      UNION ALL
      SELECT o_orderkey, o_orderpriority, cents, 'D', 1
      FROM base WHERE o_orderkey % 10 = 7
      UNION ALL
      SELECT o_orderkey + 100000000, '1-URGENT', CAST(99999 AS BIGINT), 'I', 1
      FROM base WHERE o_orderkey % 100 = 1
    ), latest AS (
      SELECT * FROM (
        SELECT c.*, ROW_NUMBER() OVER (
          PARTITION BY o_orderkey ORDER BY seq DESC, op DESC) AS rn
        FROM changes c
      ) WHERE rn = 1
    ), merged AS (
      SELECT
        CASE WHEN l.op IS NOT NULL THEN l.o_orderpriority
             ELSE b.o_orderpriority END AS o_orderpriority,
        CASE WHEN l.op IS NOT NULL THEN l.cents ELSE b.cents END AS cents
      FROM base b FULL OUTER JOIN latest l ON b.o_orderkey = l.o_orderkey
      WHERE l.op IS NULL OR l.op <> 'D'
    )
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM merged GROUP BY o_orderpriority
    """,
)
def priority_revenue_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (``operators/ivm.py``): the
    per-priority (count, revenue) rollup maintained as base-view +
    churn-sized delta, against an oracle that aggregates the merged
    snapshot directly — two different plans, identical values.  The
    measure is integer CENTS so both paths are exact: additive IVM
    re-derives sums by subtract-and-add, and float cancellation would
    otherwise make "identical" a rounding negotiation (it flipped a
    2-decimal digit at sf0.01 when this used raw doubles)."""
    from tweets_spark_top_10_spark.operators.ivm import (
        agg_delta,
        apply_agg_delta,
        build_agg_view,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    k = F.col("o_orderkey")
    upd1 = base.where(k % 10 == 3).withColumns(
        {"cents": F.col("cents") * 3, "op": F.lit("U"), "seq": F.lit(1)}
    )
    upd0 = base.where(k % 10 == 7).withColumns(
        {"cents": F.col("cents") * 2, "op": F.lit("U"), "seq": F.lit(0)}
    )
    dels = base.where(k % 10 == 7).withColumns({"op": F.lit("D"), "seq": F.lit(1)})
    ins = base.where(k % 100 == 1).withColumns(
        {
            "o_orderkey": k + F.lit(100000000),
            "o_orderpriority": F.lit("1-URGENT"),
            "cents": F.lit(99999).cast("long"),
            "op": F.lit("I"),
            "seq": F.lit(1),
        }
    )
    changes = upd1.unionByName(upd0).unionByName(dels).unionByName(ins)
    view = build_agg_view(base, ["o_orderpriority"], ["cents"])
    delta = agg_delta(base, changes, "o_orderkey", ["o_orderpriority"], ["cents"])
    out = apply_agg_delta(view, delta, ["o_orderpriority"], ["cents"])
    return out.select("o_orderpriority", "n", F.col("sum_cents"))


@register(
    "priority_price_minmax_ivm",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), changes AS (
      SELECT o_orderkey, o_orderpriority, cents * 3 AS cents, 'U' AS op, 1 AS seq
      FROM base WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT o_orderkey, o_orderpriority, cents * 2, 'U', 0
      FROM base WHERE o_orderkey % 10 = 7
      UNION ALL
      SELECT o_orderkey, o_orderpriority, cents, 'D', 1
      FROM base WHERE o_orderkey % 10 = 7
      UNION ALL
      SELECT o_orderkey + 100000000, '1-URGENT', CAST(99999 AS BIGINT), 'I', 1
      FROM base WHERE o_orderkey % 100 = 1
    ), latest AS (
      SELECT * FROM (
        SELECT c.*, ROW_NUMBER() OVER (
          PARTITION BY o_orderkey ORDER BY seq DESC, op DESC) AS rn
        FROM changes c
      ) WHERE rn = 1
    ), merged AS (
      SELECT
        CASE WHEN l.op IS NOT NULL THEN l.o_orderpriority
             ELSE b.o_orderpriority END AS o_orderpriority,
        CASE WHEN l.op IS NOT NULL THEN l.cents ELSE b.cents END AS cents
      FROM base b FULL OUTER JOIN latest l ON b.o_orderkey = l.o_orderkey
      WHERE l.op IS NULL OR l.op <> 'D'
    )
    SELECT o_orderpriority, MIN(cents) AS min_cents, MAX(cents) AS max_cents
    FROM merged GROUP BY o_orderpriority
    """,
)
def priority_price_minmax_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max under deletes via maintained SUPPORT state — the
    non-additive half of IVM.  The support multiset (count per
    (priority, cents)) is maintained by the SAME agg_delta/apply
    operators with the value folded into the grouping key; deletes
    that empty a value's count resurface the runner-up, which a
    scalar min/max view cannot do.  Oracle aggregates the merged
    snapshot directly."""
    from tweets_spark_top_10_spark.operators.ivm import (
        agg_delta,
        apply_agg_delta,
        build_agg_view,
        minmax_from_support,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    k = F.col("o_orderkey")
    upd1 = base.where(k % 10 == 3).withColumns(
        {"cents": F.col("cents") * 3, "op": F.lit("U"), "seq": F.lit(1)}
    )
    upd0 = base.where(k % 10 == 7).withColumns(
        {"cents": F.col("cents") * 2, "op": F.lit("U"), "seq": F.lit(0)}
    )
    dels = base.where(k % 10 == 7).withColumns({"op": F.lit("D"), "seq": F.lit(1)})
    ins = base.where(k % 100 == 1).withColumns(
        {
            "o_orderkey": k + F.lit(100000000),
            "o_orderpriority": F.lit("1-URGENT"),
            "cents": F.lit(99999).cast("long"),
            "op": F.lit("I"),
            "seq": F.lit(1),
        }
    )
    changes = upd1.unionByName(upd0).unionByName(dels).unionByName(ins)
    skey = ["o_orderpriority", "cents"]
    support = build_agg_view(base, skey, [])
    delta = agg_delta(base, changes, "o_orderkey", skey, [])
    support2 = apply_agg_delta(support, delta, skey, [])
    return minmax_from_support(support2, ["o_orderpriority"], "cents").select(
        "o_orderpriority",
        F.col("min_cents"),
        F.col("max_cents"),
    )


@register(
    "customer_ancestry_depth_sql",
    oracle="""
    WITH RECURSIVE walk(node, cur, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey <= 500
      UNION ALL
      SELECT node, CAST(FLOOR(cur / 2) AS BIGINT), depth + 1
      FROM walk WHERE cur > 1
    )
    SELECT node AS c_custkey, MAX(depth) AS depth
    FROM walk GROUP BY node
    """,
)
def customer_ancestry_depth_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): walk each customer
    up a synthetic binary hierarchy (parent = floor(key/2)) to the
    root and report the depth.  Same statement text runs on DuckDB —
    the SQL-surface row for iterative queries expressed declaratively
    (the DataFrame-side iteration twins are ``connected_components``
    and ``pagerank``).  Recursion depth is log2(maxkey) ~ 9 here;
    Spark executes it as repeated unions under the hood, so the guard
    is the WHERE, not driver loops."""
    import hashlib as _h

    suffix = _h.md5(sf_dir.encode()).hexdigest()[:8]
    cview = f"customer_r_{suffix}"
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(cview)
    return spark.sql(
        f"""
        WITH RECURSIVE walk(node, cur, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM {cview} WHERE c_custkey <= 500
          UNION ALL
          SELECT node, CAST(FLOOR(cur / 2) AS BIGINT), depth + 1
          FROM walk WHERE cur > 1
        )
        SELECT node AS c_custkey, MAX(depth) AS depth
        FROM walk GROUP BY node
        """
    )


@register(
    "order_measures_unpivot",
    oracle="""
    SELECT o_orderkey, metric, CAST(value AS DOUBLE) AS value
    FROM (
      SELECT o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS totalprice,
             CAST(o_custkey AS DOUBLE) AS custkey
      FROM orders WHERE o_orderkey % 100 = 0
    ) t
    UNPIVOT (value FOR metric IN (totalprice, custkey))
    """,
)
def order_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (wide → long): the inverse of the catalog's
    ``priority_status_pivot``.  ``DataFrame.unpivot`` maps to Spark's
    Unpivot node (a projection + generator, shuffle-free); the oracle
    uses DuckDB's native UNPIVOT with identical aliases."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 100 == 0
    )
    wide = orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return wide.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "nullsafe_segment_match",
    oracle="""
    WITH a AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
      FROM customer
    ), b AS (
      SELECT DISTINCT
             CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
      FROM customer
    )
    SELECT a.c_custkey, a.seg
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
)
def nullsafe_segment_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantics a
    dimension join needs when "unknown" is itself a category.  Spark
    plans eqNullSafe as an ordinary hash-join key (no null-skew
    fallout here: one NULL group), and the oracle runs the standard
    SQL spelling."""
    cust = load_table(spark, sf_dir, "customer")
    seg = F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("c_mktsegment")
    )
    a = cust.select("c_custkey", seg.alias("seg"))
    b = a.select("seg").distinct().withColumnRenamed("seg", "b_seg")
    return a.join(b, a["seg"].eqNullSafe(b["b_seg"])).select("c_custkey", "seg")


@register(
    "synthetic_events_by_type",
    oracle="""
    WITH gen AS (
      SELECT r.range AS id,
             ['click','view','purchase','scroll','share'][(r.range % 5) + 1]
               AS event_type,
             CAST(r.range * 31 % 1000 AS DOUBLE) / 10.0 AS value,
             (r.range * 2654435761) % 97 AS user_id
      FROM range(0, 4000) r
    )
    SELECT event_type, COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value,
           COUNT(DISTINCT user_id) AS nd_users
    FROM gen GROUP BY event_type
    """,
)
def synthetic_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 API): 4 partitions x 1000
    deterministic synthetic events generated executor-side with zero
    I/O (``sources/pyds.py``), then aggregated.  The oracle replays
    the documented generation rule as SQL arithmetic over ``range()``
    — checking a source DuckDB cannot run by checking the function
    that defines it."""
    from tweets_spark_top_10_spark.sources.pyds import register_synthetic_events

    register_synthetic_events(spark)
    ev = (
        spark.read.format("synthetic_events")
        .option("partitions", "4")
        .option("rows_per_partition", "1000")
        .load()
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.count_distinct("user_id").alias("nd_users"),
    )


@register(
    "nation_pair_trade_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE sn.n_nationkey <> cn.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped six-table join: cross-border trade volume per
    (supplier nation, customer nation, ship year).

    Join topology for scale: nation (25 rows, bounded) broadcasts by
    hint into the two key→nation maps; customer and supplier SCALE
    with SF, so their joins against the fact carry NO broadcast hint —
    the optimizer broadcasts them while they fit and shuffles at
    scale (a hard-coded hint here OOMs at 100 TB).  The two nation
    lookups use the SAME dimension table twice under different
    aliases — Catalyst plans them as two independent broadcasts, no
    self-join shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cust_nation = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select(
        "c_custkey",
        F.col("n_nationkey").alias("c_nk"),
        F.col("n_name").alias("cust_nation"),
    )
    supp_nation = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select(
        "s_suppkey",
        F.col("n_nationkey").alias("s_nk"),
        F.col("n_name").alias("supp_nation"),
    )
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_custkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    return (
        fact.join(cust_nation, fact.o_custkey == F.col("c_custkey"))
        .join(supp_nation, fact.l_suppkey == F.col("s_suppkey"))
        .where(F.col("s_nk") != F.col("c_nk"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "returned_item_losses",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS lost_revenue,
           COUNT(*) AS n_returned
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY lost_revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: top-20 customers by
    revenue lost to returns.  The returnflag filter pushes to the
    lineitem scan (PushedFilters); the fact side partial-aggregates
    per customer key BEFORE meeting customer (map-side combine shrinks
    the shuffle from |returned lineitems| to |customers|); nation (25
    rows) broadcasts by hint, while customer — which scales with SF —
    carries none, so the optimizer broadcasts it only while it fits;
    the ordered top-20 plans as TakeOrderedAndProject — no global sort
    materializes."""
    from tweets_spark_top_10_spark.operators.topk import top_k

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dims = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "n_name")
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_custkey", "l_extendedprice", "l_discount"
    )
    per_cust = fact.groupBy("o_custkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("lost_revenue"),
        F.count(F.lit(1)).alias("n_returned"),
    )
    agg = per_cust.join(dims, per_cust.o_custkey == dims.c_custkey).select(
        "c_custkey", "c_name", "n_name", "lost_revenue", "n_returned"
    )
    return top_k(agg, [F.desc("lost_revenue"), F.asc("c_custkey")], k=20)


@register(
    "user_conversion_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           (c.user_id IS NOT NULL) AS reached_click,
           (p.user_id IS NOT NULL) AS converted
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def user_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> first click at-or-after the
    first view -> first purchase at-or-after that click): the sequence
    constraint makes this a chain of three keyed MIN aggregates, each
    stage's threshold joined into the next stage's filter — no window
    over full event history, no per-user event collection.

    Scale: three shuffles, all keyed by user_id (uniform); each stage's
    input shrinks to users who survived the previous stage.  The same
    chain extends to any funnel depth."""
    events = load_table(spark, sf_dir, "events")
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.col("t_click").isNotNull().alias("reached_click"),
            F.col("t_purchase").isNotNull().alias("converted"),
        )
    )


@register(
    "user_hourly_ohlc",
    oracle="""
    WITH e AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, value, ts, event_id
      FROM events
    ), rn AS (
      SELECT user_id, hour, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, hour ORDER BY ts ASC, event_id ASC
             ) AS ra,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, hour ORDER BY ts DESC, event_id DESC
             ) AS rd
      FROM e
    )
    SELECT user_id, hour,
           ROUND(MAX(CASE WHEN ra = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MAX(CASE WHEN rd = 1 THEN value END), 6) AS close,
           COUNT(*) AS n_events
    FROM rn GROUP BY user_id, hour
    """,
)
def user_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling bars per (user, hour) — the time-series
    compaction that turns raw event streams into fixed-rate features
    (open/close need event ORDER, high/low are plain aggregates).

    Open/close come from first/last row numbers with a full (ts,
    event_id) tie-break — ``first_value`` without a deterministic
    order is a nondeterminism bug at any scale — then one rollup per
    (user, hour).  Both windows and the final aggregate share the
    (user_id, hour)-prefixed key, so AQE plans a single exchange."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("user_id", "hour").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    wd = Window.partitionBy("user_id", "hour").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    rn = e.select(
        "user_id",
        "hour",
        "value",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return rn.groupBy("user_id", "hour").agg(
        F.round(F.max(F.when(F.col("ra") == 1, F.col("value"))), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max(F.when(F.col("rd") == 1, F.col("value"))), 6).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "user_value_trend",
    oracle="""
    WITH e AS (
      SELECT user_id, (epoch_us(ts) - 1704067200000000) / 3600.0e6 AS x, value AS y FROM events
    ), sums AS (
      SELECT user_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM e GROUP BY user_id HAVING COUNT(*) >= 2
    )
    SELECT user_id, n,
           ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 6)
             AS slope,
           ROUND((sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) * sx)
                 / n, 6) AS intercept
    FROM sums
    """,
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of value over time — closed-form
    simple regression from raw power sums on both engines (normal
    equations: n·Σxy−ΣxΣy over n·Σx²−(Σx)² — NOT covar_pop/var_pop,
    whose streaming co-moment updates differ across engines at ~1e-7
    relative and leak past 6-digit rounding via the intercept),
    computed in ONE map-side-combined aggregate per user: the distributed form of
    per-key model fitting (no per-key data collection, no iteration).

    The x origin is pinned (fractional HOURS since 2024-01-01, derived
    from MICROSECONDS on both engines — ``unix_timestamp`` truncates
    sub-second time and silently shifts every x) so the intercept is a
    number both engines derive from identical inputs;
    users with a single event carry no slope and drop on both sides."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        (
            (F.unix_micros("ts") - F.lit(1704067200000000)) / F.lit(3600.0e6)
        ).alias("x"),
        F.col("value").alias("y"),
    )
    sums = (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .where(F.col("n") >= 2)
    )
    denom = F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    return sums.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@register(
    "doc_feature_hashing",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                        t -> t <> '')) AS token
      FROM documents
    ), feats AS (
      SELECT doc_id,
             CAST((CASE substr(md5(token), 1, 1)
                     WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2
                     WHEN '3' THEN 3 WHEN '4' THEN 4 WHEN '5' THEN 5
                     WHEN '6' THEN 6 WHEN '7' THEN 7 WHEN '8' THEN 8
                     WHEN '9' THEN 9 WHEN 'a' THEN 10 WHEN 'b' THEN 11
                     WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14
                     ELSE 15 END) * 16
                  + (CASE substr(md5(token), 2, 1)
                     WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2
                     WHEN '3' THEN 3 WHEN '4' THEN 4 WHEN '5' THEN 5
                     WHEN '6' THEN 6 WHEN '7' THEN 7 WHEN '8' THEN 8
                     WHEN '9' THEN 9 WHEN 'a' THEN 10 WHEN 'b' THEN 11
                     WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14
                     ELSE 15 END) AS BIGINT) AS fidx,
             CASE WHEN substr(md5(token), 3, 1) IN
                       ('0','1','2','3','4','5','6','7')
                  THEN 1 ELSE -1 END AS sgn
      FROM toks
    ), vec AS (
      SELECT doc_id, fidx, CAST(SUM(sgn) AS BIGINT) AS w
      FROM feats GROUP BY doc_id, fidx
    )
    SELECT doc_id,
           CAST(COUNT(*) FILTER (WHERE w <> 0) AS BIGINT) AS nnz,
           ROUND(SQRT(SUM(CAST(w AS DOUBLE) * w)), 6) AS l2,
           CAST(SUM(fidx * w) AS BIGINT) AS checksum
    FROM vec GROUP BY doc_id
    """,
)
def doc_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): every token maps to
    one of 256 feature indices via md5 with a separate hash bit for the
    sign, per-document sparse vectors built by signed counting — the
    fixed-width featurization that needs NO vocabulary pass at all
    (contrast ``doc_token_ids``), which is why it scales to unbounded
    token spaces.

    Output summarizes each sparse vector (nnz / l2 / index-weighted
    checksum) so the driver's scalar hasher can gate it; both engines
    derive index and sign from the same md5 hex digits."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("token")
    )
    hexd = F.md5(F.col("token"))
    d1 = F.conv(F.substring(hexd, 1, 2), 16, 10).cast("long")
    sgn = F.when(
        F.substring(hexd, 3, 1).isin(*"01234567"), F.lit(1)
    ).otherwise(F.lit(-1))
    vec = (
        toks.select("doc_id", d1.alias("fidx"), sgn.alias("sgn"))
        .groupBy("doc_id", "fidx")
        .agg(F.sum("sgn").cast("long").alias("w"))
    )
    return vec.groupBy("doc_id").agg(
        F.count(F.when(F.col("w") != 0, 1)).cast("long").alias("nnz"),
        F.round(F.sqrt(F.sum(F.col("w").cast("double") * F.col("w"))), 6).alias(
            "l2"
        ),
        F.sum(F.col("fidx") * F.col("w")).cast("long").alias("checksum"),
    )


@register(
    "event_value_winsorized",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, COUNT(*) AS n,
           ROUND(AVG(e.value), 6) AS raw_mean,
           ROUND(AVG(LEAST(GREATEST(e.value, b.lo), b.hi)), 6) AS wins_mean,
           CAST(SUM(CASE WHEN e.value < b.lo OR e.value > b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM events e JOIN b ON b.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def event_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized means per event type: clip to the [p05, p95] band
    before averaging — the outlier-robust aggregate feature pipelines
    use instead of raw means.  Two passes: exact interpolated
    percentile bounds per type (dimension-sized result, broadcast
    back), then one clipped aggregate over the fact stream."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        events.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("raw_mean"),
            F.round(F.avg(clipped), 6).alias("wins_mean"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("lo"))
                    | (F.col("value") > F.col("hi")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_clipped"),
        )
    )
