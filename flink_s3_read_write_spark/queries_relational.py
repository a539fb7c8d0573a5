"""Tier B core relational queries (SURVEY.md §2.2 / §7.2 step 4).

Every query is registered with a DuckDB oracle.  Cross-engine float
determinism rules used throughout (see functions/numeric.py):

- sums/avgs of *raw* 2-decimal columns: decimal(30,6)-routed dsum/davg;
- *computed* money expressions (price × (1-disc) × (1+tax)): arithmetic
  entirely in decimal from the first operand — a double product cast
  to decimal rounds differently across engines near scale boundaries,
  an exact decimal product cannot;
- division always last, in double, on identical operands;
- no transcendental functions (libm vs JVM differ in the last ulp);
  round() on money is avoided in oracle-checked outputs (half-way
  rule differs per engine), floor/ceil are safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_s3_read_write_spark.functions.numeric import davg, dsum
from flink_s3_read_write_spark.operators import relational as R
from flink_s3_read_write_spark.operators.asof import asof_join
from flink_s3_read_write_spark.queries import register
from flink_s3_read_write_spark.sources.io import load_table

# Exact decimal revenue: cast the 2-dec inputs to decimal FIRST.
# (A function, not a module-level Column: constructing a Column needs a
# live SparkContext, and the registry must be importable without one.)
def _rev_spark():
    return (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
    )
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


@register(
    "q4_pricing_summary",
    # The big money sums render through VARCHAR (r12): DuckDB's direct
    # DECIMAL->DOUBLE cast double-rounds (int128 then /10^s) once the
    # unscaled value exceeds 2^53 — at scale 6 that is sums past
    # ~$9e9, which the 10x scale-stress replica reaches (sum_charge
    # diverged from Spark's correctly-rounded cast by 1 ulp).
    # VARCHAR->DOUBLE is strtod, correctly rounded, and matches
    # Spark's BigDecimal path exactly at ANY magnitude; below 2^53
    # both forms are identical, so gate-SF values are unchanged.
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM({_REV_SQL}) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM({_REV_SQL} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: pushed-down scan filter + 8-agg partial/final hash aggregate.",
)
def q4_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        F.sum(_rev_spark()).cast("double").alias("sum_disc_price"),
        F.sum(_rev_spark() * (F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(3,2)")))
        .cast("double").alias("sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q5_revenue_by_priority",
    # VARCHAR-rendered money sum: see q4 — per-priority revenue at the
    # 10x stress tier is ~$4e10, past DuckDB's 2^53 direct-cast edge.
    oracle=f"""
    SELECT o_orderpriority,
           CAST(CAST(SUM({_REV_SQL}) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Fact⋈fact equi-join (sort-merge at scale) + re-aggregation by priority.",
)
def q5_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", _rev_spark().alias("rev"))
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum("rev").cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q6_qty_by_brand_broadcast",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="Fact⋈dim broadcast-hash join: the big side never shuffles.",
)
def q6_qty_by_brand_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.qty_by_brand(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "q7_revenue_by_nation",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="3-hop star join: one fact-fact sort-merge + two broadcast dim hops.",
)
def q7_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", _rev_spark().alias("rev"))
    return (
        li.join(load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("rev").cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q8_semi_join_segments",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    GROUP BY c_mktsegment
    """,
    doc="Left-semi join (EXISTS): only the probe key ships.",
)
def q8_semi_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.customers_with_big_orders(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders"), 400000.0
    )


@register(
    "q9_anti_join_segments",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    GROUP BY c_mktsegment
    """,
    doc="Left-anti join (NOT EXISTS).",
)
def q9_anti_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.customers_with_big_orders(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders"),
        400000.0, anti=True,
    )


@register(
    "q10_topk_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    doc="Top-k per group; Spark pushes a per-partition group limit below the shuffle.",
)
def q10_topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    return R.topk_per_group(
        orders, ["o_orderpriority"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
    )


@register(
    "q11_running_total_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
    doc="Cumulative window aggregate over a total order (date, key tiebreak).",
)
def q11_running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = R.running_total(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")],
        F.col("o_totalprice").cast("decimal(30,6)"),
        "running_spend",
    )
    return out.select("o_custkey", "o_orderkey", F.col("running_spend").cast("double").alias("running_spend"))


@register(
    "q12_order_gaps_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                 ORDER BY o_orderdate, o_orderkey) AS DATE),
                     CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    """,
    doc="lag() analytic window: per-customer inter-order gap in days.",
)
def q12_order_gaps_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lag(F.col("o_orderdate").cast("date")).over(w)).alias("days_since_prev"),
    )


@register(
    "q13_rollup_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (grand total + per-flag subtotals).",
)
def q13_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "q14_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_total,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE: all grouping-set combinations of the two dims.",
)
def q14_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        dsum("o_totalprice", "sum_total"), F.count(F.lit(1)).alias("n")
    )


@register(
    "q15_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    doc="Explicit GROUPING SETS via the SQL surface (temp view + spark.sql).",
)
def q15_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "q16_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Multi-distinct aggregate (expand + two-phase distinct aggregation).",
)
def q16_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        dsum("l_quantity", "sum_qty"),
    )


@register(
    "q17_intersect_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT (distinct) set operation.",
)
def q17_intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersect(f)


@register(
    "q18_except_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT (distinct) set operation.",
)
def q18_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.subtract(f)


@register(
    "q19_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
    """,
    doc="UNION DISTINCT across two sources.",
)
def q19_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("custkey")))
    b = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("custkey")))
    return a.union(b).distinct()


@register(
    "q20_top10_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k: TakeOrderedAndProject, no full sort.",
)
def q20_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q21_scalar_showcase",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d_str,
           upper(substr(o_orderpriority, 3)) AS prio_word,
           length(o_orderpriority) AS prio_len,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
           CASE WHEN o_totalprice >= 250000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           concat(o_orderstatus, '/', o_orderpriority) AS status_prio
    FROM orders
    """,
    doc="Scalar-function surface: date extract/format, string ops, math, CASE.",
)
def q21_scalar_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.col("o_orderdate").cast("date").cast("string").alias("d_str"),
        F.upper(F.substring("o_orderpriority", 3, 100)).alias("prio_word"),
        F.length("o_orderpriority").alias("prio_len"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_k"),
        F.when(F.col("o_totalprice") >= 250000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.concat("o_orderstatus", F.lit("/"), "o_orderpriority").alias("status_prio"),
    )


@register(
    "q22_histogram_bucket",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_total
    FROM orders
    GROUP BY 1
    """,
    doc="Numeric histogram via floor-bucketing.",
)
def q22_histogram_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "sum_total"))
    )


@register(
    "q23_pivot_events",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
    FROM events
    GROUP BY 1
    """,
    doc="Pivot (wide aggregation) with a fixed value list — single-pass, no shuffle explosion.",
)
def q23_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    piv = (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_bucket", *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds]
    )


@register(
    "q24_range_join_bands",
    oracle="""
    SELECT t.i AS band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
    FROM part JOIN range(10) t(i)
      ON p_retailprice >= 900 + t.i * 10 AND p_retailprice < 900 + (t.i + 1) * 10
    GROUP BY t.i
    """,
    doc="Range (theta) join against a tiny band table — broadcast nested loop.",
)
def q24_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_retailprice")
    bands = spark.range(10).select(F.col("id").alias("band"))
    joined = part.join(
        F.broadcast(bands),
        (F.col("p_retailprice") >= 900 + F.col("band") * 10)
        & (F.col("p_retailprice") < 900 + (F.col("band") + 1) * 10),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_parts"), dsum("p_retailprice", "sum_price")
    )


@register(
    "q25_asof_join_events",
    oracle="""
    SELECT e.event_id,
           epoch_us(e.ts) AS click_us,
           p.value        AS asof_value,
           epoch_us(p.ts) AS purchase_us
    FROM (SELECT * FROM events WHERE event_type = 'click') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    doc=(
        "As-of join (operators/asof.py): for each click, the latest purchase "
        "at-or-before it by the same user. Union+window composition — one "
        "sort per key partition, no per-group materialization."
    ),
)
def q25_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = asof_join(clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts",
                    payload=["value", "ts"])
    return out.select(
        "event_id",
        F.unix_micros("ts").alias("click_us"),
        F.col("asof_value"),
        F.unix_micros("asof_ts").alias("purchase_us"),
    )


@register(
    "q89_revenue_share",
    oracle="""
    WITH nat AS (
      SELECT n.n_regionkey AS regionkey, n.n_name AS nation,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
             SUM(CAST(o.o_totalprice AS DECIMAL(30,6))) AS rev_dec
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT r.r_name AS region, nation, revenue,
           CAST(rev_dec AS DOUBLE)
             / CAST(SUM(rev_dec) OVER (PARTITION BY regionkey) AS DOUBLE)
             AS share
    FROM nat JOIN region r ON nat.regionkey = r.r_regionkey
    """,
    doc=(
        "Percent-of-total window (ratio_to_report shape): per-nation "
        "revenue as a share of its region. The share divides DECIMAL "
        "by DECIMAL before the double cast, so the window sum is "
        "order-independent (both sides cast to double only for the "
        "final division); the window runs over the nation-level "
        "aggregate (25 rows), never the fact table."
    ),
)
def q89_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_regionkey").alias("regionkey"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("rev_dec"))
    )
    w = Window.partitionBy("regionkey")
    return (
        nat.join(F.broadcast(r), nat.regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            "nation",
            F.col("rev_dec").cast("double").alias("revenue"),
            (
                F.col("rev_dec").cast("double")
                / F.sum("rev_dec").over(w).cast("double")
            ).alias("share"),
        )
    )


@register(
    "q90_set_ops_all",
    oracle="""
    SELECT 'intersect' AS op, qty, COUNT(*) AS n FROM (
      SELECT l_quantity AS qty FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT ALL
      SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'
    ) GROUP BY qty
    UNION ALL
    SELECT 'except', qty, COUNT(*) FROM (
      SELECT l_quantity AS qty FROM lineitem WHERE l_returnflag = 'R'
      EXCEPT ALL
      SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'
    ) GROUP BY qty
    """,
    doc=(
        "Multiset set ops (INTERSECT ALL / EXCEPT ALL): "
        "duplicate-preserving semantics the DISTINCT variants "
        "(q17/q18) can't express — count-based, one shuffle each, no "
        "row explosion. Results re-aggregated per value so the check "
        "stays compact."
    ),
)
def q90_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select(F.col("l_quantity").alias("qty"))
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_quantity").alias("qty"))
    inter = (
        r.intersectAll(a)
        .groupBy("qty")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect").alias("op"), "qty", "n")
    )
    exc = (
        r.exceptAll(a)
        .groupBy("qty")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except").alias("op"), "qty", "n")
    )
    return inter.unionByName(exc)
