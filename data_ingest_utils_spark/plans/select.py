"""SURVEY §2c — projection / filter / predicates.

All predicates are Column expressions ⇒ Catalyst pushes them into the
parquet scan (PushedFilters) and prunes columns (ReadSchema) — the
100 TB behavior tests/test_explain.py asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingest_utils_spark.plans.registry import plan
from data_ingest_utils_spark.sources.readers import load_table


@plan(
    "sel_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS revenue
    FROM lineitem
    """,
)
def sel_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
    )


@plan(
    "sel_filter_pred",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 300000
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND o_custkey IS NOT NULL
    """,
)
def sel_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicate mix: IN, BETWEEN, LIKE, IS NULL."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 300000)
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


@plan(
    "sel_filter_date",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
    """,
)
def sel_filter_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp range predicate — pushes to parquet row-group stats."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
            & (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


@plan(
    "sel_sample_hash",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS o_totalprice
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
          % 100 < 10
    """,
)
def sel_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by key hash — the reproducible
    alternative to rand()-based sampling: the same rows are drawn on
    every run, every engine, and every retry of a failed task (rand()
    sampling is NOT replay-stable under task retries — a recomputed
    partition redraws).  Pure map-side predicate, no shuffle; at
    100 TB this is also join-consistent: sampling two fact tables by
    the same key hash keeps their join intact on the sample."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return o.filter(bucket < 10).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 6).alias("o_totalprice")
    )


@plan(
    "sel_sample_reservoir_group",
    oracle="""
    SELECT lang, doc_id, rk FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents) _t
    WHERE rk <= 5
    """,
)
def sel_sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k-per-group sample (k=5 per language) — the
    distributed, replay-stable stand-in for per-group reservoir
    sampling: rank rows inside each stratum by a keyed hash and keep
    the first k.  Unlike rand()-reservoirs it draws the SAME rows on
    every run, engine, and task retry, and appending new rows only
    ever displaces existing picks (a row's rank depends on its own
    hash), so balanced training subsets stay stable across corpus
    epochs.

    Plan shape: one hash-partitioned window per stratum, row_number
    cut at k — a single shuffle on the group key.  At 100 TB put a
    permissive hash-bucket pre-filter in front (keep hash-bucket <
    ~10·k·|strata|/|T| of rows map-side) so the window sorts a sliver,
    not the corpus; the md5-hex ordering here is the cross-engine
    dialect (swap xxhash64 for the production path, same shape)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )
