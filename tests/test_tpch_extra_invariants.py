"""Cross-query invariants for the adapted TPC-H suite — properties that
must hold between queries (not just against the per-query oracle), plus a
unit pin on registry.spread's conditional repartition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from processor_edf_spark.plans import QUERIES
from processor_edf_spark.plans.registry import load, spread
from tests.conftest import SF_SMALL


def test_spread_widens_narrow_scans_only(spark):
    """spread() must repartition a narrow scan up to the shuffle width and
    leave an already-wide frame untouched (no gratuitous corpus shuffle)."""
    (documents,) = load(spark, SF_SMALL, "documents")
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert documents.rdd.getNumPartitions() < width  # single-file premise
    widened = spread(spark, documents)
    assert widened.rdd.getNumPartitions() == width

    already_wide = documents.repartition(width)
    assert spread(spark, already_wide) is already_wide  # identity, no new node


def test_q13_distribution_accounts_for_every_customer(spark):
    """The order-count histogram must partition the customer table: bucket
    counts sum to |customer| (zero-order customers included via the left
    join)."""
    (customer,) = load(spark, SF_SMALL, "customer")
    dist = QUERIES["q13_order_count_distribution"](spark, SF_SMALL)
    assert (
        dist.agg(F.sum("custdist")).first()[0] == customer.count()
    )


def test_q2_reports_the_true_minimum_offer(spark):
    """Every reported (part, supplier) row must carry that part's global
    minimum unit cost — no offer for the same part may undercut it."""
    offers = QUERIES["q2_min_cost_supplier"](spark, SF_SMALL)
    per_part = offers.groupBy("p_partkey").agg(
        F.countDistinct("unit_cost").alias("n_costs")
    )
    assert per_part.filter(F.col("n_costs") > 1).count() == 0


def test_q15_top_supplier_dominates(spark):
    """q15's winner revenue must equal the max over the same quarterly
    per-supplier aggregation computed independently."""
    (lineitem,) = load(spark, SF_SMALL, "lineitem")
    from processor_edf_spark.plans.relational import money_sum

    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
    )
    expected_max = rev.agg(F.max("r")).first()[0]
    top = QUERIES["q15_top_supplier"](spark, SF_SMALL).collect()
    assert top and all(r["total_revenue"] == expected_max for r in top)


def test_q21_lone_fault_orders_have_one_returner(spark):
    """Reconstruct q21's premise directly: every counted order has >= 2
    suppliers and exactly 1 with a returned line (sum of numwait = number
    of qualifying orders)."""
    lineitem, orders = load(spark, SF_SMALL, "lineitem", "orders")
    li = lineitem.join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("ns"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("nf"),
    )
    qualifying = per_order.filter((F.col("ns") >= 2) & (F.col("nf") == 1)).count()
    numwait_total = (
        QUERIES["q21_lone_fault_supplier"](spark, SF_SMALL)
        .agg(F.sum("numwait"))
        .first()[0]
    )
    assert numwait_total == qualifying


def test_semdedup_survivor_set_is_maximal_antichain_prefix(spark):
    """SemDeDup keep-lowest-id policy: the lowest vec_id of every label
    must always survive, and survivors+dominated partition the table."""
    (embeddings,) = load(spark, SF_SMALL, "embeddings")
    survivors = QUERIES["semdedup_label"](spark, SF_SMALL)
    lowest = embeddings.groupBy("label").agg(F.min("vec_id").alias("vec_id"))
    missing = lowest.join(survivors, ["label", "vec_id"], "left_anti").count()
    assert missing == 0
    assert survivors.count() <= embeddings.count()


def test_ngram_kernels_handle_short_documents(spark):
    """Spark's sequence(1, 0) is the DESCENDING array [1, 0] — short
    documents must be filtered out before the explode (matching DuckDB's
    empty generate_series), not double-counted or crashed on."""
    from processor_edf_spark.plans import text_dedup as td
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "ab", "en", "s", 2), (2, "one two", "en", "s", 7),
         (3, "alpha beta gamma delta epsilon zeta", "en", "s", 35)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    orig = td.load
    td.load = lambda spark_, sf_dir, *names: [docs]
    try:
        grams = td.ngram_lang_profile(spark, "ignored")
        total = grams.agg(F.sum("cnt")).first()[0]
        # doc1 too short (0 trigrams), doc2: 5, doc3: 33 → top-10 window
        # caps output but the underlying explode must not double-count
        assert total is not None and total > 0
        boiler = td.boilerplate_ngrams(spark, "ignored")
        assert boiler.count() == 0  # no 5-gram repeats across these docs
    finally:
        td.load = orig
