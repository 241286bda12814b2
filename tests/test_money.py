"""Cross-engine pinning of plans/money.py (code-review r13): the
micro-unit money accumulation is the correctness core of twelve graded
keys — exercise money_sum (Column), money_sum_sql (both dialects), and
their mutual agreement on synthetic data covering the edges the
fixtures can't: negative sums, all-NULL groups, exact cent half-steps,
and sums past 2^53 micro-units."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from data_ingest_utils_spark.plans.money import money_sum, money_sum_sql


def _frame():
    import random

    random.seed(13)
    rows = []
    for _ in range(4000):
        rows.append(("big", random.uniform(1e7, 2e10)))  # sum past 2^53 micro
    for _ in range(5000):
        rows.append(("money", random.uniform(100.0, 90000.0)
                     * (1 - random.uniform(0, 0.1))))
    for _ in range(300):
        rows.append(("neg", -random.uniform(0.0, 999.99)))
    rows += [("half", 0.005)] * 9          # sums to exactly 0.045
    rows += [("neghalf", -0.005)] * 9      # sums to exactly -0.045
    return pd.DataFrame(rows, columns=["g", "v"])


def test_money_sum_cross_engine_and_order_insensitive(spark, duck):
    pdf = _frame()
    duck.register("_money_t", pdf)
    oracle = duck.execute(
        f"SELECT g, {money_sum_sql('v', 2)} AS m2, {money_sum_sql('v', 6)} AS m6 "
        "FROM _money_t GROUP BY g ORDER BY g"
    ).fetchdf()
    sdf = spark.createDataFrame(pdf)
    outs = set()
    for parts in (1, 7, 32):  # accumulation order must not matter
        got = (
            sdf.repartition(parts)
            .groupBy("g")
            .agg(money_sum(F.col("v"), 2).alias("m2"),
                 money_sum(F.col("v"), 6).alias("m6"))
            .orderBy("g")
            .toPandas()
        )
        outs.add(tuple(map(tuple, got[["g", "m2", "m6"]].to_numpy())))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), oracle.reset_index(drop=True),
            check_exact=True,
        )
    assert len(outs) == 1  # bit-identical across partitionings
    # HALF_UP away from zero on exact half-steps, both signs
    m = {r.g: r.m2 for r in got.itertuples()}
    assert m["half"] == 0.05 and m["neghalf"] == -0.05
    duck.unregister("_money_t")


def test_money_sum_spark_sql_dialect_matches_column_form(spark):
    pdf = _frame()
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_money_t")
    via_sql = spark.sql(
        f"SELECT g, {money_sum_sql('v', 2, dialect='spark')} AS m2 "
        "FROM _money_t GROUP BY g ORDER BY g"
    ).toPandas()
    via_col = (
        sdf.groupBy("g").agg(money_sum(F.col("v"), 2).alias("m2"))
        .orderBy("g").toPandas()
    )
    pd.testing.assert_frame_equal(via_sql, via_col, check_exact=True)


def test_money_sum_null_transparent(spark, duck):
    """An all-NULL group yields NULL like plain SUM; FILTER-style
    F.when NULLs ride through (the agg_filtered shape)."""
    sdf = spark.createDataFrame(
        [("a", 1.0, "F"), ("a", 2.0, "O"), ("b", 3.0, "O")],
        "g string, v double, st string",
    )
    got = (
        sdf.groupBy("g")
        .agg(money_sum(F.when(F.col("st") == "F", F.col("v"))).alias("m"))
        .orderBy("g")
        .collect()
    )
    assert got[0].m == 1.0 and got[1].m is None


def test_money_sum_sql_filter_clause_duck_only():
    with pytest.raises(ValueError, match="duck-only"):
        money_sum_sql("v", 2, dialect="spark", filter_where="x = 1")
