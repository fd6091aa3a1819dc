"""Adapted TPC-H suite completion (q2/q7-q13/q15/q16/q19-q22) + ntile.

The testdata schema is a slimmed TPC-H: no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``l_shipmode`` columns, so the queries
that need them (q2, q11, q12, q16, q20, q21) are *adapted* to equivalent
plan shapes over the columns that exist — each docstring states the
adaptation.  What matters for the engine is the SHAPE (correlated
scalar subqueries, double-correlated exists, left-join count
distributions, disjunctive pushdown, window-vs-aggregate min), not the
exact TPC-H predicate constants.

Float parity with the DuckDB oracle follows the house discipline
(``money_sum``/``money_avg``: per-row ROUND(x,4) → exact DECIMAL sum →
one double cast, identical on both engines).  Quantity sums are raw
doubles: ``l_quantity`` is integer-valued (1..50), so SUM over doubles is
exact and order-independent.  Scale notes are per-query.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from processor_edf_spark.plans.registry import TS_US, load, register
from processor_edf_spark.plans.relational import (
    _mavg_sql,
    _msum_sql,
    money_avg,
    money_sum,
)


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# q2 — min-cost supplier (adapted: offers derived from lineitem, no partsupp)
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    """
    WITH offers AS (
        SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
               s.s_acctbal,
               MIN(FLOOR(l.l_extendedprice * 10000 / l.l_quantity) / 10000.0)
                 AS unit_cost
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE' AND p.p_size = 15
        GROUP BY p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
                 s.s_acctbal
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal, unit_cost
    FROM (
        SELECT o.*, MIN(unit_cost) OVER (PARTITION BY p_partkey) AS best
        FROM offers o
    )
    WHERE unit_cost = best
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (adapted: the offer book is derived from lineitem
    unit prices since the testdata has no partsupp): per part, keep the
    European supplier(s) quoting the minimum unit cost.

    Plan: dims (part/supplier/nation/region) broadcast onto the lineitem
    scan, partial agg per (part, supplier), then a window-min per part over
    the already-aggregated (small) offer table — the heavy fact table is
    touched once, and the correlated ``= MIN(...)`` subquery of the SQL
    form becomes one narrow window.

    The unit cost truncates (FLOOR(x*10^4)/10^4) rather than rounds: a
    quotient has arbitrary binary decimals, so ROUND(x, 4) can land on a
    half-ulp boundary where Spark's BigDecimal HALF_UP and DuckDB's
    double rounding disagree (observed at sf0.001: 26.24125 -> .2412 vs
    .2413).  FLOOR over the identical IEEE product/quotient is
    deterministic on both engines, making both the MIN and the double
    equality against the window-min exact.
    """
    lineitem, part, supplier, nation, region = load(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    eur_supp = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )
    offers = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_size") == 15)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(eur_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "n_name", "s_acctbal")
        .agg(
            F.min(
                F.floor(
                    F.col("l_extendedprice") * F.lit(10000) / F.col("l_quantity")
                )
                / F.lit(10000.0)
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("best", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("best"))
        .drop("best")
    )


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


@register(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year, {rev} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l.l_shipdate) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2')
          AND n2.n_name IN ('NATION_1', 'NATION_2')
          AND n1.n_name <> n2.n_name
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """.format(rev=_msum_sql("volume")),
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by ship year.
    The nation table joins TWICE under different roles — both broadcast.
    The supplier-side nation filter reaches the lineitem scan through the
    broadcast join before the orders shuffle, so the shuffled fact subset
    is pre-shrunk on both dimensions."""
    lineitem, orders, customer, supplier, nation = load(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    pair = ("NATION_1", "NATION_2")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(*pair))
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(*pair))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# q8 — national market share
# ---------------------------------------------------------------------------

_VOL_DEC = "CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(28,4))"


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_dec
                               ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
                 / CAST(SUM(vol_dec) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               {_VOL_DEC} AS vol_dec,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n2.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_3's share of STANDARD-part volume sold into
    ASIA, by order year.  Share = conditional-sum / total-sum inside one
    aggregate pass (no second scan, no join of two aggregates).  Both
    sums are exact decimals; the single double division and ROUND(x,6)
    happen on identical operands on both engines."""
    lineitem, part, orders, customer, supplier, nation, region = load(
        spark, sf_dir,
        "lineitem", "part", "orders", "customer", "supplier", "nation", "region",
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol_dec = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).cast("decimal(28,4)")
    zero_dec = F.lit(0).cast("decimal(28,4)")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == "STANDARD")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1998-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("c_rk") == F.col("r_regionkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol_dec).otherwise(
                        zero_dec
                    )
                ).cast("double")
                / F.sum(vol_dec).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# q9 — product-type profit (adapted: retailprice-based cost proxy)
# ---------------------------------------------------------------------------


@register(
    "q9_product_profit",
    """
    SELECT nation, o_year, {amt} AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               EXTRACT(year FROM o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                 - 0.1 * p.p_retailprice * l.l_quantity AS amount
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """.format(amt=_msum_sql("amount")),
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (adapted: profit cost term is 0.1·p_retailprice·qty
    since there is no ps_supplycost): profit on 'red' parts by supplier
    nation and order year.  The LIKE filter broadcasts with part, so only
    matching lineitems reach the orders shuffle.  The profit expression
    multiplies left-to-right in both engines → bit-identical doubles into
    the decimal summation."""
    lineitem, part, supplier, nation, orders = load(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders"
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(money_sum(F.col("amount")).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# q10 — returned-item revenue ranking
# ---------------------------------------------------------------------------


@register(
    "q10_returned_revenue",
    """
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name, {rev} AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """.format(rev=_msum_sql("l.l_extendedprice * (1 - l.l_discount)")),
)
def q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in one
    quarter.  ORDER BY ... LIMIT 20 is a TakeOrderedAndProject — each
    partition keeps only its local top-20, the driver merges 20·P rows,
    no global sort.  The (revenue DESC, c_custkey ASC) tiebreak makes the
    selected SET deterministic, so the order-insensitive driver hash is
    stable across engines."""
    customer, orders, lineitem, nation = load(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= _ts("1997-01-01"))
                & (F.col("o_orderdate") < _ts("1997-04-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q11 — important parts (adapted: value from one nation's lineitem flow)
# ---------------------------------------------------------------------------


@register(
    "q11_important_parts",
    """
    WITH pv AS (
        SELECT l.l_partkey,
               SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                        AS DECIMAL(28,4))) AS v
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(ROUND(v, 2) AS DOUBLE) AS part_value
    FROM pv
    WHERE CAST(v AS DOUBLE) > 0.001 * (SELECT CAST(SUM(v) AS DOUBLE) FROM pv)
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (adapted: part value = revenue flowing through
    NATION_7's suppliers, since there is no partsupp stock table): parts
    whose value exceeds 0.001 of the nation total.  The scalar subquery
    becomes a broadcast of a 1-row aggregate over the (already small)
    per-part aggregate — the fact table is scanned once; the threshold
    compare reuses pv, not a rescan.  Both the per-part and grand totals
    are exact decimals, so the double compare is identical cross-engine."""
    lineitem, supplier, nation = load(spark, sf_dir, "lineitem", "supplier", "nation")
    nat7_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    pv = (
        lineitem.join(F.broadcast(nat7_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast(
                    "decimal(28,4)"
                )
            ).alias("v")
        )
    )
    total = pv.agg(F.sum("v").cast("double").alias("grand_total"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.lit(0.001) * F.col("grand_total"))
        .select(
            "l_partkey", F.round(F.col("v"), 2).cast("double").alias("part_value")
        )
    )


# ---------------------------------------------------------------------------
# q12 — priority counts (adapted: l_linestatus stands in for l_shipmode)
# ---------------------------------------------------------------------------


@register(
    "q12_priority_by_status",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_status(spark, sf_dir):
    """TPC-H Q12 shape (adapted: grouped by l_linestatus, the testdata has
    no l_shipmode): urgent-vs-other order counts per line status for one
    ship year.  Conditional-count aggregation — one joined pass, partial
    aggregation on both shuffle sides."""
    lineitem, orders = load(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution
# ---------------------------------------------------------------------------


@register(
    "q13_order_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
               ON o.o_custkey = c.c_custkey
              AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts, orders
    pre-filtered INSIDE the left join (customers with zero matches count
    as 0, not dropped).  Two-level aggregate: the first groupBy reuses the
    join's hash partitioning on the customer key (no second shuffle); the
    second aggregates ~distinct-count-many rows."""
    customer, orders = load(spark, sf_dir, "customer", "orders")
    return (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# q15 — top supplier
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey, {rev} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """.format(rev=_msum_sql("l_extendedprice * (1 - l_discount)")),
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The view + scalar-max subquery becomes: aggregate once, broadcast the
    1-row max back onto the (small) per-supplier aggregate — no window
    over a single partition, no rescan of lineitem.  Equality on doubles
    is safe: both sides are the same money_sum output."""
    lineitem, supplier = load(spark, sf_dir, "lineitem", "supplier")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q16 — supplier variety per part attribute (adapted: via lineitem)
# ---------------------------------------------------------------------------


@register(
    "q16_supplier_variety",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape (adapted: supplier-part relationships observed in
    lineitem, no partsupp): distinct suppliers able to supply each
    (brand, type, size) bucket.  countDistinct expands to a two-stage
    partial-distinct aggregate — the dedup happens map-side before the
    shuffle."""
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    p = part.filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q19 — disjunctive predicate revenue
# ---------------------------------------------------------------------------


@register(
    "q19_disjunctive_revenue",
    """
    SELECT {rev} AS revenue, COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """.format(rev=_msum_sql("l.l_extendedprice * (1 - l.l_discount)")),
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides.  Catalyst
    factors the single-side conjuncts out of the disjunction: the part
    side pushes (brand, size) unions into the broadcast build, and the
    lineitem side pushes the derived quantity-range union
    (1<=qty<=30) to the parquet scan, so the residual OR runs on a
    pre-pruned join output."""
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    j = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#4") & size.between(1, 15) & qty.between(20, 30))
    )
    return j.filter(cond).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# q20 — bulk suppliers (adapted: share-of-part shipped volume)
# ---------------------------------------------------------------------------


@register(
    "q20_bulk_suppliers",
    """
    WITH shipped AS (
        SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS supp_qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'small%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_partkey, l.l_suppkey
    ),
    tot AS (
        SELECT l_partkey, SUM(supp_qty) AS part_qty FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM shipped sh
    JOIN tot t      ON t.l_partkey = sh.l_partkey
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE' AND sh.supp_qty > 0.3 * t.part_qty
    """,
)
def q20_bulk_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (adapted: a supplier qualifies by shipping >30% of
    a 'small%' part's 1997 volume, no partsupp availability): nested
    IN-subqueries become aggregate → re-aggregate → join.  ``tot`` derives
    from ``shipped`` (no lineitem rescan) and the (partkey, suppkey) →
    (partkey) re-aggregation is shuffle-free: the second groupBy's key is
    a prefix of the first's hash partitioning.  Quantity sums are exact
    (integer-valued doubles)."""
    lineitem, part, supplier, nation, region = load(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(
            F.broadcast(part.filter(F.col("p_name").like("small%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    tot = shipped.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    eur_supp = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        shipped.join(tot, "l_partkey")
        .filter(F.col("supp_qty") > F.lit(0.3) * F.col("part_qty"))
        .join(F.broadcast(eur_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# q21 — lone faulty supplier (adapted: returnflag marks the fault)
# ---------------------------------------------------------------------------


@register(
    "q21_lone_fault_supplier",
    """
    WITH per_order AS (
        SELECT l.l_orderkey,
               COUNT(DISTINCT l.l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN l.l_returnflag = 'R'
                                   THEN l.l_suppkey END) AS n_fault
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY l.l_orderkey
    ),
    faults AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN per_order po ON po.l_orderkey = l.l_orderkey
        WHERE l.l_returnflag = 'R' AND po.n_supp >= 2 AND po.n_fault = 1
    )
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
    FROM faults f
    JOIN supplier s ON s.s_suppkey = f.l_suppkey
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def q21_lone_fault_supplier(spark, sf_dir):
    """TPC-H Q21 shape (adapted: 'fault' = returned line, the testdata has
    no commit/receipt dates): suppliers who were the SOLE returner on
    multi-supplier finalized orders.  The classic EXISTS / NOT-EXISTS
    correlated pair is expressed as one grouped pass over lineitem
    (count-distinct total vs faulty suppliers per order), then a
    self-join back — two shuffles on l_orderkey total; AQE reuses the
    exchange for the second."""
    lineitem, orders, supplier = load(spark, sf_dir, "lineitem", "orders", "supplier")
    li_f = lineitem.join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("l_orderkey", "l_suppkey", "l_returnflag")
    per_order = li_f.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_fault"),
    )
    faults = (
        li_f.filter(F.col("l_returnflag") == "R")
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_fault") == 1)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        faults.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# q22 — idle rich customers (adapted: idle since 1999, nationkey code)
# ---------------------------------------------------------------------------

_Q22_NATIONS = "(1, 3, 5, 7, 9, 11, 13)"


@register(
    "q22_idle_rich_customers",
    f"""
    WITH eligible AS (
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer WHERE c_nationkey IN {_Q22_NATIONS}
    ),
    thr AS (
        SELECT {_mavg_sql("c_acctbal")} AS cutoff
        FROM eligible WHERE c_acctbal > 0.0
    )
    SELECT e.c_nationkey, COUNT(*) AS numcust, {_msum_sql("e.c_acctbal")} AS totacctbal
    FROM eligible e, thr
    WHERE e.c_acctbal > thr.cutoff
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = e.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY e.c_nationkey
    """,
)
def q22_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape (adapted: country code = c_nationkey, 'no orders'
    = no orders since 1999 — every sf0.01 customer has SOME order):
    above-average-balance customers gone idle, by nation.  The scalar AVG
    subquery broadcasts as a 1-row aggregate; the NOT EXISTS is a LEFT
    ANTI join against the date-filtered orders (filter pushed below the
    anti join's shuffle).  The cutoff uses the money_avg discipline so
    the boundary compare is bit-identical cross-engine."""
    customer, orders = load(spark, sf_dir, "customer", "orders")
    eligible = customer.filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    thr = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        money_avg(F.col("c_acctbal")).alias("cutoff")
    )
    recent = orders.filter(F.col("o_orderdate") >= _ts("1999-01-01")).select(
        "o_custkey"
    )
    return (
        eligible.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# ntile — quartile summary (window-function family: NTILE)
# ---------------------------------------------------------------------------


@register(
    "ntile_value_quartiles",
    """
    SELECT event_type, q, COUNT(*) AS n,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM (
        SELECT event_type, value,
               NTILE(4) OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS q
        FROM events
    )
    GROUP BY event_type, q
    """,
)
def ntile_value_quartiles(spark, sf_dir):
    """NTILE window coverage: quartile boundaries of event values per
    type.  The (value, event_id) ordering makes tile assignment fully
    deterministic under ties.  One shuffle on event_type serves both the
    window sort and the downstream groupBy (same partitioning)."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return (
        events.select("event_type", "value", F.ntile(4).over(w).alias("q"))
        .groupBy("event_type", "q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# window / set-op surface extras (RANGE frames, INTERSECT ALL, date parts)
# ---------------------------------------------------------------------------

RANGE_FRAME_USEC = 3_600_000_000  # 1 hour


@register(
    "range_frame_user_avg",
    f"""
    WITH e AS (
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t_usec,
               CAST(ROUND(value, 4) AS DECIMAL(28,4)) AS v
        FROM events
    )
    SELECT user_id, t_usec,
           ROUND(CAST(SUM(v) OVER w AS DOUBLE) / COUNT(*) OVER w, 4) AS avg_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY t_usec
                 RANGE BETWEEN {RANGE_FRAME_USEC} PRECEDING AND CURRENT ROW)
    """,
)
def range_frame_user_avg(spark, sf_dir):
    """RANGE-frame window (vs the ROWS frame of moving_avg_daily_revenue):
    per event, the user's average value over the TRAILING HOUR of event
    time — frame membership decided by timestamp distance, not row count,
    so rows with equal timestamps always share a frame (deterministic
    under ties, no tiebreak needed).  The windowed SUM runs over exact
    decimals: engines disagree on float window-aggregation order (segment
    trees vs running sums), decimals make the tree shape irrelevant.
    One shuffle on user_id; per-partition sort feeds the sliding frame in
    O(n) amortized."""
    (events,) = load(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        F.expr(TS_US).alias("t_usec"),
        F.round(F.col("value"), 4).cast("decimal(28,4)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_usec")
        .rangeBetween(-RANGE_FRAME_USEC, 0)
    )
    return e.select(
        "user_id",
        "t_usec",
        F.round(
            F.sum("v").over(w).cast("double") / F.count(F.lit(1)).over(w), 4
        ).alias("avg_1h"),
    )


@register(
    "intersect_all_user_days",
    """
    SELECT user_id, day FROM (
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'click'
        INTERSECT ALL
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'purchase'
    )
    """,
)
def intersect_all_user_days(spark, sf_dir):
    """INTERSECT ALL (multiset semantics — the set_ops_event_types query
    covers plain INTERSECT): (user, day) click rows ∩ purchase rows
    keeping MIN(multiplicity) copies, i.e. how many click-day slots also
    had a purchase.  Spark plans intersectAll as a counted aggregate +
    generate replay (two shuffles on the pair key), not a join — count
    states shuffle, not row multisets."""
    (events,) = load(spark, sf_dir, "events")
    day = F.date_format(
        F.col("ts").cast("timestamp"), "yyyy-MM-dd"
    ).alias("day")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", day)
    buys = events.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.intersectAll(buys)


@register(
    "dow_hour_heatmap",
    """
    SELECT CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS dow,
           CAST(EXTRACT(hour  FROM ts) AS BIGINT) AS hour,
           COUNT(*) AS n_events,
           {sv} AS sum_value
    FROM events
    GROUP BY 1, 2
    """.format(sv=_msum_sql("value")),
)
def dow_hour_heatmap(spark, sf_dir):
    """Activity heatmap by ISO weekday × hour (the date-part extraction
    family: F8's EDF date parse covers construction, this covers
    decomposition).  Spark's weekday() is 0=Monday, so weekday+1 ==
    DuckDB's isodow; both engines evaluate in UTC (the session factory
    pins spark.sql.session.timeZone=UTC and DuckDB timestamps are
    naive).  Single groupBy over 168 output groups — partial agg makes
    the shuffle negligible at any scale."""
    (events,) = load(spark, sf_dir, "events")
    tstamp = F.col("ts").cast("timestamp")
    return (
        events.select(
            (F.weekday(tstamp) + 1).cast("long").alias("dow"),
            F.hour(tstamp).cast("long").alias("hour"),
            "value",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("sum_value"),
        )
    )
