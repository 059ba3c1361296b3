"""Core relational queries: the reference query + the batch operator surface.

Each query exercises one cluster of SURVEY.md §2 operators and carries a
DuckDB oracle. Scale notes live on the builders they exercise
(operators/ and functions/); plan-shape assertions are in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.text import tokenize
from tweets_spark_top_10_spark.operators.explode_count import explode_count
from tweets_spark_top_10_spark.operators.joins import broadcast_join
from tweets_spark_top_10_spark.operators.topk import top_k, top_k_per_group
from tweets_spark_top_10_spark.queries.registry import register
from tweets_spark_top_10_spark.sources.registry import load_table


# --- R2-R10: the reference query (explode → count → top-10) -------------
# Reference: App.java:92-134. The fixtures carry no tweets table, so the
# acceptance twin explodes tokenized document text instead of a
# hashtags array — same plan shape: Generate → partial/final
# HashAggregate → TakeOrderedAndProject. Deterministic tie-break added
# (reference bug, SURVEY.md §1.2).
@register(
    "ref_top10_tokens",
    oracle=r"""
    SELECT token, COUNT(*) AS n FROM (
      SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents
    ) t
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 10
    """,
)
def ref_top10_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference query (App.java:92-134): explode -> group-count -> top-10 with deterministic tie-break, over document tokens."""
    docs = load_table(spark, sf_dir, "documents")
    counted = explode_count(
        docs, tokenize(F.col("text")), out_key="token", out_count="n"
    )
    return top_k(counted, [F.desc("n"), F.asc("token")], k=10)


@register(
    "top_event_types",
    oracle="""
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY n DESC, event_type ASC
    LIMIT 10
    """,
)
def top_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's group-count + top-K shape on the events stream table."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    return top_k(agg, [F.desc("n"), F.asc("event_type")], k=10)


# --- TPC-H Q1-shaped pricing summary: the canonical wide aggregate ------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag, l_linestatus,
      ROUND(SUM(l_quantity), 4) AS sum_qty,
      ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
      ROUND(AVG(l_quantity), 6) AS avg_qty,
      ROUND(AVG(l_extendedprice), 6) AS avg_price,
      ROUND(AVG(l_discount), 6) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide agg with map-side partial aggregation; the shipdate filter
    must reach the parquet scan as a pushed filter (asserted in tests)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- Q3-shaped join + agg + top-K ---------------------------------------
@register(
    "top_revenue_orders",
    oracle="""
    SELECT
      l.l_orderkey,
      ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
      o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
      AND l.l_shipdate > TIMESTAMP '1997-06-30'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer (filtered, small) broadcasts into orders, then the
    orders→lineitem join shuffles on orderkey. Top-10 via
    TakeOrderedAndProject, never a full sort."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-30")
    )
    joined = broadcast_join(
        orders, cust.select("c_custkey"), orders.o_custkey == F.col("c_custkey")
    ).join(li, F.col("o_orderkey") == li.l_orderkey)
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    ).select("l_orderkey", "revenue", "o_orderdate")
    return top_k(agg, [F.desc("revenue"), F.asc("l_orderkey")], k=10)


# --- Q5-shaped multi-join rollup of revenue by nation -------------------
@register(
    "regional_customer_revenue",
    oracle="""
    SELECT
      r.r_name, n.n_name,
      ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
      COUNT(*) AS n_items
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name, n.n_name
    """,
)
def regional_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with pre-aggregation pushdown: the BOUNDED dims
    (nation: 25 rows, region: 5) broadcast by hint; customer SCALES
    with the corpus (15M rows × SF), so it must never carry a
    broadcast hint — a hint overrides the optimizer's size check and
    OOMs at 100 TB where AQE would have picked a shuffle join.
    Before meeting customer, the fact side partial-aggregates per
    customer key (map-side combined), shrinking the join input from
    |lineitem| to |customers|; the final (region, nation) re-aggregate
    is 125 groups."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name", "n_name")
    )
    fact = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "o_custkey", "l_extendedprice", "l_discount"
    )
    per_cust = fact.groupBy("o_custkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_cust.join(dims, per_cust.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("rev"), 4).alias("revenue"),
            F.sum("n").alias("n_items"),
        )
    )


# --- Window functions: per-group top-K ----------------------------------
@register(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-K via row_number window - the scalable form of 'ORDER BY LIMIT per key'."""
    orders = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        group_by=["o_custkey"],
        order_by=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )


# --- Window functions: running aggregate + lag --------------------------
@register(
    "user_running_value",
    oracle="""
    SELECT
      user_id, event_id,
      ROUND(SUM(value) OVER (
        PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ), 6) AS running_value,
      ROUND(COALESCE(LAG(value) OVER (
        PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ), 0.0), 6) AS prev_value
    FROM events
    """,
)
def user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per user over event time with an explicit ROWS frame."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return events.select(
        "user_id",
        "event_id",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 6
        ).alias("running_value"),
        F.round(F.coalesce(F.lag("value").over(w), F.lit(0.0)), 6).alias("prev_value"),
    )


# --- Anti join (NOT EXISTS) ---------------------------------------------
@register(
    "customers_without_big_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
    )
    """,
)
def customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti against a filtered+distinct key set.  The key set is a
    constant FRACTION of customers (high-value orders track order
    volume), so it scales with SF — no broadcast hint: the optimizer
    broadcasts it while it fits and falls back to a shuffled anti-join
    at scale (an earlier version hinted broadcast "at any scale",
    which OOMs exactly when the data gets big)."""
    cust = load_table(spark, sf_dir, "customer")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select("o_custkey")
        .distinct()
    )
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- Semi join with a non-equi condition (EXISTS + range) ---------------
@register(
    "late_shipping_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def late_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join (EXISTS): orders having any lineitem shipped >60 days
    after order date, counted by priority.  Timestamp INTERVAL arithmetic
    (not ``date_add``, which truncates to DATE and would diverge from the
    oracle if o_orderdate ever carries a time-of-day)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --- Set operations ------------------------------------------------------
@register(
    "nations_cust_and_supp",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
)
def nations_cust_and_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of customer-nations and supplier-nations (set op)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


@register(
    "urgent_only_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def urgent_only_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (subtract): customers with urgent orders and no low-priority ones."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    # subtract == EXCEPT DISTINCT (exceptAll+distinct would keep keys
    # that appear on both sides but more often on the left).
    return urgent.subtract(low)


# --- Rollup (grouping sets) ----------------------------------------------
@register(
    "lineitem_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotals + grand total in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --- Date functions -------------------------------------------------------
@register(
    "monthly_revenue",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           ROUND(SUM(o_totalprice), 4) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc month rollup of order revenue (time-dimension aggregation)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month")
        )
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --- Broadcast dim join + agg over the join ------------------------------
@register(
    "segment_order_stats",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 4) AS total_revenue,
           COUNT(DISTINCT c.c_custkey) AS n_customers
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment order stats: count/sum/avg/min/max in one hash aggregate after a broadcast dim join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        broadcast_join(
            orders,
            cust.select("c_custkey", "c_mktsegment"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_revenue"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )


# --- Distinct aggregation -------------------------------------------------
@register(
    "supplier_distinct_parts",
    oracle="""
    SELECT l_suppkey,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def supplier_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_distinct per supplier (expands to two-phase distinct aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- Predicate surface: BETWEEN / IN / LIKE / AND-OR ---------------------
@register(
    "part_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part
    WHERE p_size BETWEEN 10 AND 25
      AND (p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') OR p_type LIKE 'PROMO%')
      AND p_retailprice > 905.0
    """,
)
def part_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate surface in one scan: =, <, >, IN, LIKE, BETWEEN, IS NULL, AND/OR/NOT - all pushed to the parquet reader."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_size").between(10, 25)
        & (
            F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            | F.col("p_type").like("PROMO%")
        )
        & (F.col("p_retailprice") > 905.0)
    )


# --- JSON extraction ------------------------------------------------------
@register(
    "event_props_k",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           COUNT(*) AS n,
           ROUND(SUM(value), 6) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def event_props_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object string-path extraction from the JSON props column (the untyped fast path; props_map_access is the typed one)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.get_json_object("props", "$.k").cast("long").alias("k")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )
