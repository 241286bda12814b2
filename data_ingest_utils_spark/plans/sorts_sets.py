"""SURVEY §2g (sort / limit / top-k) and §2h (set operations)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingest_utils_spark.operators.relational import join_dim, top_n_global
from data_ingest_utils_spark.plans.registry import plan
from data_ingest_utils_spark.sources.readers import load_table


@plan(
    "sort_multi_key",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_acctbal END AS sort_key
    FROM customer
    ORDER BY sort_key ASC NULLS FIRST, c_custkey
    LIMIT 100
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS FIRST + unique tiebreaker so
    the LIMIT boundary is a total order (SURVEY §7 determinism)."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "sort_key",
        F.when(F.col("c_mktsegment") == "BUILDING", F.lit(None)).otherwise(
            F.col("c_acctbal")
        ),
    )
    return c.orderBy(
        F.col("sort_key").asc_nulls_first(), F.col("c_custkey")
    ).limit(100).select("c_custkey", "c_mktsegment", "sort_key")


@plan(
    "sort_limit_topk",
    oracle="""
    SELECT l_orderkey, o_orderdate,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: join + agg + global top-10.  orderBy().limit()
    plans TakeOrderedAndProject (per-partition heaps, no global sort);
    ordering on the ROUNDED revenue keeps the cutoff identical on both
    engines; l_orderkey breaks ties."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'")
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
            "revenue"
        )
    )
    return top_n_global(agg, [F.col("revenue").desc(), F.col("l_orderkey")], 10)


# ----------------------------------------------------------- set ops

@plan(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 150000
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (duplicates preserved) of two overlapping splits."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return o.filter(F.col("o_orderstatus") == "O").unionByName(
        o.filter(F.col("o_totalprice") > 150000)
    )


@plan(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


@plan(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations having both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@plan(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers (distinct EXCEPT)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)


@plan(
    "set_intersect_all",
    oracle="""
    SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_quantity < 10
    INTERSECT ALL
    SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_discount > 0.05
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): each (suppkey, flag) row
    survives min(count_left, count_right) times.  Spark plans this as a
    single hash aggregate per side + one shuffle on the full row key —
    no distinct collapse, unlike ``set_intersect``."""
    li = load_table(spark, sf_dir, "lineitem")
    left = li.filter(F.col("l_quantity") < 10).select("l_suppkey", "l_returnflag")
    right = li.filter(F.col("l_discount") > 0.05).select("l_suppkey", "l_returnflag")
    return left.intersectAll(right)


@plan(
    "set_except_all",
    oracle="""
    SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_quantity < 10
    EXCEPT ALL
    SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_discount > 0.05
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): keeps max(count_left -
    count_right, 0) copies per row value — the bag-semantics sibling of
    ``set_except``.  Same single-shuffle hash-agg shape as
    ``set_intersect_all``."""
    li = load_table(spark, sf_dir, "lineitem")
    left = li.filter(F.col("l_quantity") < 10).select("l_suppkey", "l_returnflag")
    right = li.filter(F.col("l_discount") > 0.05).select("l_suppkey", "l_returnflag")
    return left.exceptAll(right)


@plan(
    "sort_range_distributed",
    oracle="""
    SELECT o_orderkey, o_orderdate, round(o_totalprice, 6) AS price
    FROM orders
    """,
)
def sort_range_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed total ordering the way a 100 TB write wants it:
    repartitionByRange (sampled range boundaries, one Exchange) +
    sortWithinPartitions (local sort, global=false) — partition i is
    entirely ≤ partition i+1, so concatenating output files in
    partition order IS the total order, with no single-node merge step
    (orderBy's global=true Sort).  Content is hash-checked; the plan
    shape (RangePartitioning + non-global Sort) is asserted in
    tests/test_explain.py."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.repartitionByRange(8, "o_orderdate", "o_orderkey")
        .sortWithinPartitions("o_orderdate", "o_orderkey")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 6).alias("price"),
        )
    )


_ZVAL_EXPR = (
    "((((l_orderkey & 255) >> 0) & 1) << 0) + ((((l_partkey  & 255) >> 0) & 1) << 1) + ((((l_orderkey & 255) >> 1) & 1) << 2) + ((((l_partkey  & 255) >> 1) & 1) << 3) + ((((l_orderkey & 255) >> 2) & 1) << 4) + ((((l_partkey  & 255) >> 2) & 1) << 5) + ((((l_orderkey & 255) >> 3) & 1) << 6) + ((((l_partkey  & 255) >> 3) & 1) << 7) + ((((l_orderkey & 255) >> 4) & 1) << 8) + ((((l_partkey  & 255) >> 4) & 1) << 9) + ((((l_orderkey & 255) >> 5) & 1) << 10) + ((((l_partkey  & 255) >> 5) & 1) << 11) + ((((l_orderkey & 255) >> 6) & 1) << 12) + ((((l_partkey  & 255) >> 6) & 1) << 13) + ((((l_orderkey & 255) >> 7) & 1) << 14) + ((((l_partkey  & 255) >> 7) & 1) << 15)"
)


@plan(
    "sort_zorder_layout",
    oracle="""
    SELECT l_orderkey, l_partkey,
           CAST(((((l_orderkey & 255) >> 0) & 1) << 0) + ((((l_partkey  & 255) >> 0) & 1) << 1) + ((((l_orderkey & 255) >> 1) & 1) << 2) + ((((l_partkey  & 255) >> 1) & 1) << 3) + ((((l_orderkey & 255) >> 2) & 1) << 4) + ((((l_partkey  & 255) >> 2) & 1) << 5) + ((((l_orderkey & 255) >> 3) & 1) << 6) + ((((l_partkey  & 255) >> 3) & 1) << 7) + ((((l_orderkey & 255) >> 4) & 1) << 8) + ((((l_partkey  & 255) >> 4) & 1) << 9) + ((((l_orderkey & 255) >> 5) & 1) << 10) + ((((l_partkey  & 255) >> 5) & 1) << 11) + ((((l_orderkey & 255) >> 6) & 1) << 12) + ((((l_partkey  & 255) >> 6) & 1) << 13) + ((((l_orderkey & 255) >> 7) & 1) << 14) + ((((l_partkey  & 255) >> 7) & 1) << 15) AS BIGINT) AS zval
    FROM lineitem
    """,
)
def sort_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout: interleave the low 8 bits of two join/
    filter dimensions into one sort key, then repartitionByRange +
    sortWithinPartitions on it.  Files written in this order are
    clustered in BOTH dimensions at once, so min/max footer stats
    prune scans for predicates on either column — the multi-dimension
    data-layout trick (Delta/Iceberg OPTIMIZE ZORDER) expressed with
    stock Spark.  The z-value is a pure integer expression (shifts/
    masks, whole-stage codegen); the range partitioner samples it, so
    there is no global sort.  The oracle checks the interleave math
    cell-for-cell.  The WRITE half lives in ``sink_zorder_cluster``
    (plans/scans.py, round 14): min/max-quantized 16-bit coordinates,
    a real 16-file landing, parquet-footer span certificates, and a
    round-trip box-query oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    with_z = li.select(
        "l_orderkey", "l_partkey", F.expr(_ZVAL_EXPR).cast("long").alias("zval")
    )
    return with_z.repartitionByRange(8, "zval").sortWithinPartitions("zval")


@plan(
    "set_union_evolved",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(NULL AS VARCHAR) AS o_orderpriority, 'v1' AS schema_ver
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_orderpriority, 'v2' AS schema_ver
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def set_union_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: unionByName(allowMissingColumns=True)
    aligns by NAME and null-fills columns one side lacks — the append
    path when a feed adds fields mid-stream.  Positional UNION would
    silently misalign or fail; byName is the only safe way to stack
    v1/v2 extracts, and it costs nothing (a projection, no shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", F.lit("v1").alias("schema_ver")
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority",
        F.lit("v2").alias("schema_ver"),
    )
    return v1.unionByName(v2, allowMissingColumns=True)
