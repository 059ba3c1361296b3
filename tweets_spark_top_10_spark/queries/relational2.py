"""Second batch of relational coverage: ranking windows, cube, set
aggregation, string/map scalar functions, approx distinct."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.queries.registry import register
from tweets_spark_top_10_spark.sources.registry import load_table


@register(
    "customer_balance_ranks",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(RANK() OVER w AS BIGINT) AS bal_rank,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS bal_dense_rank,
           CAST(NTILE(4) OVER w AS BIGINT) AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def customer_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over per-segment balance order (deterministic tie-break on custkey)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
    )


@register(
    "order_status_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 4) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def order_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all grouping-set combinations in one shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("revenue"),
    )


@register(
    "segment_priority_sets",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def segment_priority_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + sort_array: set aggregation with deterministic
    output order (collect_set alone is order-nondeterministic).

    The sorted set is emitted as a '|'-joined string so the driver's
    pandas canonicalizer can hash it (raw array cells are unhashable).

    Scale shape: distinct (custkey, priority) pairs are taken FIRST —
    ≤5 rows per customer instead of every order — so the customer join
    sees a bounded multiple of |customers|, and customer (which scales
    with SF) carries no broadcast hint: the optimizer picks broadcast
    only while it fits.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    ord_d = orders.select("o_custkey", "o_orderpriority").distinct()
    return (
        ord_d.join(
            cust.select("c_custkey", "c_mktsegment"),
            ord_d.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), "|"
            ).alias("priorities"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
    )


@register(
    "part_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_name, 1, 5) AS name_prefix,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
           replace(p_type, 'PROMO', 'PROMOTION') AS type_replaced,
           length(p_name) AS name_len
    FROM part
    """,
)
def part_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: upper, substring, regexp_extract, lpad, replace, length."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.replace(F.col("p_type"), F.lit("PROMO"), F.lit("PROMOTION")).alias(
            "type_replaced"
        ),
        F.length("p_name").cast("long").alias("name_len"),
    )


@register(
    "props_map_access",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    ORDER BY n DESC, k_val ASC
    LIMIT 15
    """,
)
def props_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → MapType → element_at: the typed-map access path (vs
    event_props_k's get_json_object string path)."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        events.groupBy(
            F.element_at(m, "k").cast("long").alias("k_val")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("k_val"))
        .limit(15)
    )


@register(
    "props_key_counts",
    oracle="""
    SELECT key, COUNT(*) AS n
    FROM (SELECT unnest(json_keys(props)) AS key FROM events
          WHERE props IS NOT NULL)
    GROUP BY key
    """,
)
def props_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_keys over JSON-parsed props: schema discovery for a
    semi-structured column (which keys exist, how often)."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        events.filter(F.col("props").isNotNull())
        .select(F.explode(F.map_keys(m)).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) next to the exact count: the scale
    path for cardinality at 100 TB (no exact distinct shuffle).

    The raw HLL estimate is engine-specific (DuckDB cannot replay
    Spark's sketch), but the sketch's CONTRACT is engine-independent:
    at rsd=0.02 the estimate must land within a 5% band of the truth
    (measured 0.4% on the fixtures).  So the query emits the exact
    count plus the in-band boolean, and the oracle asserts the
    invariant — a sketch-accuracy gate the driver can value-hash,
    upgraded from the old rows-only check."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return agg.select(
        "event_type", "exact_users", (err <= 0.05).alias("approx_within_5pct")
    )
