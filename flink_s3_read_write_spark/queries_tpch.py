"""TPC-H-shape query surface, part 2: the remaining canonical TPC-H
plan shapes adapted to the driver's star schema (which lacks
``partsupp``, ``l_shipmode`` and ``l_commitdate`` — each query notes
its adaptation).  Together with q4 (Q1), q59 (Q3), q77 (Q18), q95
(Q21), q98 (Q22) and q99 (lateral) this completes the classic join /
subquery / conditional-aggregation shape coverage the reference has
none of (SURVEY.md §2.2: joins, aggregations, subqueries all ABSENT
from `/root/reference/src/` — its only aggregate is the keyed running
sum+count at S3FlinkAverageSalaryByCity.java:75-80).

Cross-engine determinism: every money sum routes through
DECIMAL(30,6) (see functions/numeric.py) so partial/final hash
aggregation on any partitioning matches DuckDB's single-threaded
fold bit-for-bit; ratios divide two already-deterministic doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_s3_read_write_spark.functions.numeric import dsum
from flink_s3_read_write_spark.queries import register
from flink_s3_read_write_spark.sources.io import load_table
from flink_s3_read_write_spark.sql import run_sql

_DEC = "decimal(30,6)"


@register(
    "q103_promo_revenue",
    oracle="""
    SELECT
      100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                   ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
        AS promo_revenue_pct,
      CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                   ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE) AS promo_revenue,
      COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    doc=(
        "TPC-H Q14 shape (promo revenue): one-month scan filter pushed to "
        "the lineitem scan, broadcast part join, conditional DECIMAL sums "
        "ratioed in double only at the end. The CASE lives inside the "
        "partial aggregate, so the promo/total split costs no extra pass; "
        "adaptation: p_type is a single word here, so equality replaces "
        "TPC-H's LIKE 'PROMO%%'."
    ),
)
def q103_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(_DEC))
    month = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    joined = month.join(F.broadcast(part), month.l_partkey == part.p_partkey)
    return joined.agg(
        (100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double")).alias(
            "promo_revenue_pct"
        ),
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q104_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < 0.2 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = p_partkey)
    """,
    doc=(
        "TPC-H Q17 shape (small-quantity-order revenue): correlated scalar "
        "AVG subquery per part, decorrelated by Catalyst into a per-part "
        "aggregate joined back onto the probe — one aggregate over the "
        "filtered brand's lineitems instead of a subquery per row. "
        "Quantities are integral doubles, so AVG is exact on both engines "
        "and the 0.2x threshold cannot ulp-flip. Adaptation: no "
        "p_container column, so the brand filter alone plays the Q17 "
        "selectivity role."
    ),
)
def q104_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0 AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < 0.2 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
                                  WHERE l2.l_partkey = p_partkey)
    """)


@register(
    "q105_disjunctive_pred",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc=(
        "TPC-H Q19 shape (disjunctive discounted revenue): three OR'd "
        "brand/size/quantity branches over the part join. Catalyst "
        "extracts the common l_quantity bounds and the per-side conjuncts "
        "from the disjunction, so both scans still get pushed filters "
        "instead of a full cartesian evaluation; the join stays a single "
        "broadcast hash join with the residual OR as its condition."
    ),
)
def q105_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    branch = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(branch)
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "q106_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS val
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, CAST(val AS DOUBLE) AS part_value
    FROM pv
    WHERE val * 2000 > (SELECT SUM(val) FROM pv)
    """,
    doc=(
        "TPC-H Q11 shape (important stock): per-part value vs a fraction "
        "of the global total, the group-vs-global-scalar HAVING pattern. "
        "The threshold compares val*2000 > SUM(val) in pure DECIMAL — "
        "exact rational arithmetic, so the cut cannot ulp-flip between "
        "engines (same trick as q98). Spark does not materialize SQL "
        "CTEs, so the scalar-subquery formulation scans lineitem TWICE; "
        "here the per-part aggregate is cached and both the global total "
        "and the filter read the one materialization — a single lineitem "
        "scan, and the cached pv is only n_parts rows (tiny next to "
        "lineitem at any scale). The total joins back as a broadcast of "
        "one row (adaptation: lineitem value plays partsupp, which this "
        "schema lacks)."
    ),
)
def q106_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(_DEC)).alias("val"))
        .cache()
    )
    total = pv.agg(F.sum("val").alias("total"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("val") * 2000 > F.col("total"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("val").cast("double").alias("part_value"),
        )
    )


@register(
    "q107_supplier_variety",
    oracle="""
    SELECT p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_type, p_size
    """,
    doc=(
        "TPC-H Q16 shape (supplier variety): COUNT(DISTINCT supplier) per "
        "(type, size) with a NOT IN exclusion subquery. The exclusion "
        "list (negative-balance suppliers) is tiny and broadcast as a "
        "null-aware anti join; the distinct count expands to a two-phase "
        "aggregate keyed on (type, size, suppkey) then (type, size). "
        "Adaptation: lineitem plays partsupp, the balance predicate plays "
        "TPC-H's complaint-comment LIKE."
    ),
)
def q107_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, """
        SELECT p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_type, p_size
    """)


@register(
    "q108_nation_pair_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    """,
    doc=(
        "TPC-H Q7 shape (volume shipping between a nation pair): the "
        "six-table join with a symmetric OR over the two nation-role "
        "assignments. The two fact-fact joins (lineitem-orders) shuffle; "
        "every dimension hop (customer, supplier, both nation aliases) "
        "broadcasts, and the nation filter prunes before the fact join "
        "via the supplier/customer key lists. Year extraction is cast to "
        "INT on both engines so the group key types agree."
    ),
)
def q108_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "q109_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n2.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN part     ON p_partkey = l_partkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                         ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           CAST(SUM(volume) AS DOUBLE) AS total_volume
    FROM vol
    GROUP BY o_year
    """,
    doc=(
        "TPC-H Q8 shape (national market share): one nation's share of a "
        "region's yearly volume for one product type — an eight-table "
        "join reduced to conditional-sum / sum per year. Both sums are "
        "DECIMAL-exact and shared by one partial aggregate; the share "
        "divides the two resulting doubles once. Customer-side nation "
        "restricts to the ASIA region while the supplier-side nation "
        "only labels rows — the share numerator needs no second scan."
    ),
)
def q109_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, """
        WITH vol AS (
          SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS volume,
                 n1.n_name AS supp_nation
          FROM lineitem
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n2 ON n2.n_nationkey = c_nationkey
          JOIN region   ON r_regionkey = n2.n_regionkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n1 ON n1.n_nationkey = s_nationkey
          JOIN part     ON p_partkey = l_partkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                             ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
               CAST(SUM(volume) AS DOUBLE) AS total_volume
        FROM vol
        GROUP BY o_year
    """)


@register(
    "q110_local_supplier_volume",
    oracle="""
    SELECT n_name, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc=(
        "TPC-H Q5 shape (local supplier volume): the distinguishing "
        "feature is the non-key equality c_nationkey = s_nationkey inside "
        "the supplier join — revenue only counts when customer and "
        "supplier share a nation. The region filter prunes the nation "
        "broadcast to one fifth before it reaches the facts; the "
        "order-date range is pushed to the orders scan."
    ),
)
def q110_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "q111_profit_by_nation",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST((l_extendedprice * (1 - l_discount))
                         - ((p_retailprice * l_quantity) * 0.01) AS DECIMAL(30,6)))
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
    doc=(
        "TPC-H Q9 shape (product-type profit): per-(supplier-nation, "
        "order-year) profit over a part-name LIKE filter. The profit "
        "expression is one fixed-shape double tree per row — "
        "(price*(1-disc)) - ((retail*qty)*0.01) — evaluated identically "
        "by both engines, then summed in DECIMAL. Adaptation: "
        "p_retailprice*1%% plays partsupp.ps_supplycost, which this "
        "schema lacks; the LIKE is genuinely non-sargable (substring "
        "match) exactly as in TPC-H."
    ),
)
def q111_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    amount = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        - ((F.col("p_retailprice") * F.col("l_quantity")) * 0.01)
    ).cast(_DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


@register(
    "q112_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc=(
        "TPC-H Q10 shape (returned-item reporting): quarter of orders, "
        "returned lineitems only, revenue per customer, top 20. The "
        "returnflag and date filters are both pushed to their scans "
        "before the fact-fact join; the final top-20 is "
        "TakeOrderedAndProject (never a full sort). The DECIMAL-exact "
        "revenue makes the ORDER BY cut deterministic; c_custkey breaks "
        "any remaining ties."
    ),
)
def q112_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q116_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    reg AS (
      SELECT c.l_partkey, c.supply_cost, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    ),
    m AS (
      SELECT *, MIN(supply_cost) OVER (PARTITION BY l_partkey) AS min_cost FROM reg
    )
    SELECT p.p_partkey, p.p_name, m.s_suppkey, m.s_name, m.s_acctbal, m.n_name,
           m.supply_cost
    FROM m JOIN part p ON p.p_partkey = m.l_partkey
    WHERE p.p_size = 15 AND m.supply_cost = m.min_cost
    """,
    doc=(
        "TPC-H Q2 shape (minimum-cost supplier): for each qualifying part, "
        "the supplier(s) offering the regional minimum supply cost. The "
        "correlated-MIN-subquery formulation is rewritten as ONE pass: "
        "per-(part,supplier) cost aggregate, broadcast dimension joins "
        "with the region filter applied before the window, then a "
        "per-part MIN window on the already-aggregated (tiny) cost table "
        "— no second lineitem scan, no decorrelation needed. supply_cost "
        "is a plain MIN (no arithmetic), so the equality against the "
        "window min is exact on both engines. Adaptation: lineitem plays "
        "partsupp (this schema has no ps_supplycost); min extendedprice "
        "plays supply cost."
    ),
)
def q116_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supply_cost")
    )
    reg = (
        cost.join(F.broadcast(supp), cost.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("l_partkey")
    m = reg.withColumn("min_cost", F.min("supply_cost").over(w))
    return (
        m.filter(F.col("supply_cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal",
            "n_name", "supply_cost",
        )
    )


@register(
    "q117_late_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape (order priority checking): orders in one quarter "
        "with at least one late line, counted per priority. The EXISTS is "
        "a LEFT SEMI join on orderkey with the lateness predicate as the "
        "join condition — each order counted once no matter how many late "
        "lines, and the quarter filter prunes the orders scan before the "
        "shuffle. Adaptation: this schema has no commit/receipt dates, so "
        "'late' means shipped more than 60 days after the order date."
    ),
)
def q117_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q118_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6 shape (forecast revenue change): pure scan-filter-"
        "aggregate, zero joins, zero shuffles past the partial agg — the "
        "canonical predicate-pushdown showcase (year, discount band and "
        "quantity all reach the parquet scan as PushedFilters). The "
        "discount band compares the stored doubles directly (no "
        "arithmetic before the compare), and the revenue product routes "
        "through DECIMAL so the sum is partition-order-independent."
    ),
)
def q118_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast(_DEC)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q119_late_line_priority",
    oracle="""
    SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY
                THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    doc=(
        "TPC-H Q12 shape (shipping modes / priority): lines bucketed by a "
        "derived lateness class, priority split as conditional sums inside "
        "one aggregate — two output rows from one fact-fact join with the "
        "year filter pushed to the lineitem scan. Integer counts only, so "
        "cross-engine exactness is free. Adaptation: no l_shipmode or "
        "commit/receipt dates in this schema; the 90-day ship lag plays "
        "the mode split."
    ),
)
def q119_late_line_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.lit("LATE"),
    ).otherwise(F.lit("ONTIME"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q120_custdist",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON o_custkey = c_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    doc=(
        "TPC-H Q13 shape (customer order-count distribution): LEFT join "
        "with a non-key predicate inside the ON clause (excluded orders "
        "must not turn customers into non-matches), COUNT of non-null "
        "order keys per customer, then the distribution of those counts — "
        "the classic two-level aggregate. The priority filter prunes the "
        "orders side BEFORE the join (Catalyst pushes ON-clause filters "
        "on the non-preserved side down to the scan); zero-order "
        "customers flow through as c_count = 0. Integer-only output."
    ),
)
def q120_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    c_orders = (
        cust.join(
            orders,
            (orders.o_custkey == cust.c_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q121_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc=(
        "TPC-H Q15 shape (top supplier): per-supplier quarterly revenue, "
        "keep the supplier(s) at the global maximum. Like q106, the view "
        "is referenced twice, so the per-supplier aggregate is CACHED and "
        "the one-row global max joins back as a broadcast — one lineitem "
        "scan total (a single-partition MAX-OVER-() window would also "
        "avoid the rescan but serializes every supplier through one task "
        "at scale; the cached re-aggregate stays parallel). Revenue stays "
        "DECIMAL through the equality compare — ties are exact — and "
        "converts to double only for output."
    ),
)
def q121_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
            .alias("total_revenue")
        )
        .cache()
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q122_part_promotion_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 30
      )
      AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
    """,
    doc=(
        "TPC-H Q20 shape (potential part promotion): suppliers who moved "
        "a significant volume of a name-matched part in one year, "
        "restricted to one nation — nested IN subqueries where the inner "
        "one aggregates before filtering (HAVING over SUM). Both INs "
        "become LEFT SEMI joins; the part-name LIKE and year filters "
        "prune before the group-by, and the nation probe is a broadcast. "
        "Quantities are integral doubles, so the volume threshold is "
        "exact on both engines."
    ),
)
def q122_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    movers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
    )
    return (
        supp.join(movers, supp.s_suppkey == movers.l_suppkey, "leftsemi")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation.n_nationkey,
            "leftsemi",
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
