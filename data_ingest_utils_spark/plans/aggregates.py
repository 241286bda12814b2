"""SURVEY §2e — aggregations.

groupBy().agg() compiles to partial (map-side) + final hash
aggregation automatically — the 100 TB shape.  Float outputs whose
value depends on partition/accumulation order are ROUND(…, 6) on both
engine and oracle sides (SURVEY §7); money sums whose magnitude can
reach the rounding grid's half-step use the exact integer micro-unit
accumulation in plans/money.py instead (round 13 — see its module
docstring for the full derivation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingest_utils_spark.plans.money import money_sum, money_sum_sql
from data_ingest_utils_spark.plans.registry import plan
from data_ingest_utils_spark.sources.readers import load_table


@plan(
    "agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(l_quantity), 6)      AS sum_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           min(l_extendedprice)           AS min_price,
           max(l_extendedprice)           AS max_price,
           min(l_shipdate)                AS min_ship,
           max(l_shipdate)                AS max_ship
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@plan(
    "agg_hash_group",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 6)      AS sum_qty,
           {money_sum_sql('l_extendedprice', 2)} AS sum_base_price,
           {money_sum_sql('l_extendedprice * (1 - l_discount)', 2)} AS sum_disc_price,
           {money_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 2)} AS sum_charge,
           round(avg(l_quantity), 6)      AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6)      AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the flagship (``entry``) query."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        # money sums via exact micro-unit accumulation (plans/money.py,
        # round 13): the r8 2-dp hardening only widened the half-step;
        # integer accumulation removes order sensitivity entirely
        money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        money_sum(disc_price).alias("sum_disc_price"),
        money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@plan(
    "agg_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@plan(
    "agg_count_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct — expands to a two-phase aggregate.  100 TB: for
    dashboards prefer agg_approx_count_distinct (HLL, one pass)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@plan("agg_approx_count_distinct")  # rows-only: HLL estimate ≠ exact oracle
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type — the single-pass,
    fixed-memory sketch that replaces exact count-distinct at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


@plan(
    "agg_filtered",
    oracle=f"""
    SELECT o_orderpriority,
           {money_sum_sql('o_totalprice', 2, filter_where="o_orderstatus = 'F'")} AS f_total,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           count(*) AS n_all
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (pivot-style) aggregation via sum(CASE WHEN …).

    f_total reaches ~2.5e10 at sf1 — squarely in the money-sum
    half-step class — so it accumulates in exact integer micro-units
    (plans/money.py, round 13); the ``F.when`` NULL for non-matching
    rows rides through floor/cast/sum exactly like the oracle's
    FILTER clause skipping them."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        money_sum(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
        ).alias("f_total"),
        F.count(F.when(F.col("o_orderstatus") == "O", F.lit(1))).alias("n_open"),
        F.count("*").alias("n_all"),
    )


@plan(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 6) AS sum_qty, count(*) AS n_rows
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").rollup(
        "l_returnflag", "l_linestatus"
    ).agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


@plan(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 6) AS sum_qty, count(*) AS n_rows
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").cube(
        "l_returnflag", "l_linestatus"
    ).agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


@plan(
    "agg_grouping_sets",
    oracle=f"""
    SELECT c_mktsegment, n_name,
           count(*) AS n_rows, {money_sum_sql('c_acctbal', 2)} AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL entry point (EP3).

    sum_bal accumulates in exact integer micro-units (plans/money.py,
    round 13): the grand-total () grouping set sums every customer's
    balance (~6.8e8 at sf1), in the money-sum half-step class since
    the round-8 probe; c_acctbal can be negative, which the
    sign-symmetric cents step handles identically in both engines."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).createOrReplaceTempView(
        "_gs_customer_nation"
    )
    return spark.sql(
        f"""
        SELECT c_mktsegment, n_name,
               count(*) AS n_rows,
               {money_sum_sql('c_acctbal', 2, dialect='spark')} AS sum_bal
        FROM _gs_customer_nation
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
        """
    )


@plan(
    "agg_collect_sorted",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderstatus)), ',') AS statuses,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sorted value list; sort_array pins the order that
    collect_list leaves unspecified, stringified for stable hashing."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("o_orderstatus"))).alias("statuses"),
        F.count("*").alias("n_orders"),
    )


@plan(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via bitmaps: bucket each key with
    bitmap_bucket_number, OR the per-bucket bitmaps map-side
    (bitmap_construct_agg is a partial agg), then sum popcounts.
    Versus COUNT(DISTINCT) — which shuffles every distinct (group,
    key) pair — this shuffles one ≤4 KB bitmap per (group, 32768-key
    bucket): at 100 TB with dense int keys that is orders of
    magnitude less shuffle for the same exact answer."""
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bits")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bits)")).alias("n_users")
    )


@plan(
    "agg_approx_topk",
    oracle="""
    SELECT event_type AS item, count(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via approx_top_k (frequent-items sketch).  The
    sketch is a fixed-size partial aggregate: each task tracks <=
    maxItemsTracked counters and merges map-side, so finding the top
    K of a 100 TB stream never shuffles per-key rows — contrast exact
    GROUP BY + ORDER BY which shuffles the full key space.  Counts
    are exact whenever distinct items fit the tracked capacity (the
    fixture's 5 event types vs 10 000 tracked), which is what lets
    the oracle assert exact equality here; the approximation-regime
    guarantee (no false positives, never-undercounting estimates,
    heavy hitters always surfaced) is asserted in
    tests/test_invariants.py."""
    ev = load_table(spark, sf_dir, "events")
    sketched = ev.agg(
        F.expr("approx_top_k(event_type, 5)").alias("topk")
    )
    return sketched.select(F.explode("topk").alias("e")).select(
        F.col("e.item").alias("item"),
        F.col("e.count").alias("cnt"),
    )


@plan(
    "agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(l_linenumber) AS BIGINT) AS flags_and,
           CAST(bit_or(l_linenumber)  AS BIGINT) AS flags_or,
           CAST(bit_xor(l_linenumber) AS BIGINT) AS flags_xor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates — permission-mask folding,
    feature-flag unions, parity checks.  Fully associative +
    commutative ⇒ Spark runs them as partial aggregates (map-side
    combine to one word per group per partition)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").cast("long").alias("flags_and"),
        F.bit_or("l_linenumber").cast("long").alias("flags_or"),
        F.bit_xor("l_linenumber").cast("long").alias("flags_xor"),
    )


@plan(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
             AS gid,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id(): the bitmask that tells subtotal
    levels apart (0=leaf, 1=per-status, 3=grand total) — what report
    writers key legends off, and what disambiguates a real NULL key
    from a subtotal NULL.  Bit order (first listed key = MSB) agrees
    between Spark grouping_id and DuckDB GROUPING — verified by this
    oracle."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n"),
    ).select("o_orderstatus", "o_orderpriority", "gid", "n")


@plan(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
             AS wavg_price,
           round(avg(l_extendedprice), 6) AS plain_avg
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average as two partial-aggregable sums — the
    distributed-safe formulation (a naive avg-of-ratios is both wrong
    and not combinable across partitions).  Plain avg alongside shows
    the skew the weighting corrects."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
            / F.sum("l_quantity"),
            6,
        ).alias("wavg_price"),
        F.round(F.avg("l_extendedprice"), 6).alias("plain_avg"),
    )


@plan(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 6)  AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
           round(median(l_discount), 6) AS median_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group percentiles (p50/p90/p99 + a median) — the
    numeric-profiling aggregate every data-quality report runs.
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    same linear-interpolation definition ((1−g)·aᵢ + g·aᵢ₊₁ at rank
    (n−1)·q), so the result is oracle-hash-checkable at 6 dp.

    Scale note: exact percentile buffers each group's values (one
    sorted digest per group per partial) — fine for bounded group
    counts like this 3-flag rollup even at 100 TB, since the
    per-group buffer, not the row count, is the memory bound.  For
    high-cardinality keys or relaxed accuracy the drop-in is
    ``percentile_approx`` (GK sketch, fixed memory, mergeable) — the
    same trade agg_approx_count_distinct documents for distinct
    counts."""
    # ONE percentile buffer for the three l_extendedprice quantiles
    # (round 17, guide §2.4/§5.1): three scalar `percentile` aggs each
    # buffered the full column per group per partial — the multi-
    # quantile form sorts one buffer and interpolates all three ranks
    # from it, same definition, identical doubles (A/B: results equal,
    # sf0.1 warm noop median 3.09 → 1.10 s).
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))"
            ).alias("_ps"),
            F.expr("percentile(l_discount, 0.5)").alias("_md"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("_ps")[0], 6).alias("p50"),
            F.round(F.col("_ps")[1], 6).alias("p90"),
            F.round(F.col("_ps")[2], 6).alias("p99"),
            F.round(F.col("_md"), 6).alias("median_disc"),
        )
    )
