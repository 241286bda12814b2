"""Property-based cross-engine layer (SURVEY §5): randomized small
frames pushed through core relational ops on BOTH Spark and DuckDB,
results compared exactly.

This hunts semantic divergence the fixture oracles can't reach —
NULL handling in aggregates, empty inputs, duplicate keys, join
multiplicities, NULL ordering — on inputs pytest fixtures would never
think to write.  Examples are kept small (≤40 rows) so each property
runs in seconds; hypothesis shrinks any counterexample to a minimal
frame.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(0, 5),
        st.one_of(st.none(), st.integers(-1000, 1000)),
        st.text(alphabet="abc ", max_size=8),
    ),
    max_size=40,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _pdf(rows):
    return pd.DataFrame(rows, columns=["k", "v", "s"]).astype(
        {"k": "int64", "v": "object", "s": "object"}
    )


def _sdf(spark, rows):
    return spark.createDataFrame(
        [(int(k), None if v is None else int(v), s) for k, v, s in rows],
        "k long, v long, s string",
    )


def _norm(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        out.append(
            tuple(None if pd.isna(x) else (int(x) if isinstance(x, float) and x == int(x) else x) for x in row)
        )
    return sorted(out, key=repr)


def _duck(rows_by_name: dict[str, pd.DataFrame], sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name, pdf in rows_by_name.items():
        con.register(name, pdf)
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


@SETTINGS
@given(rows=ROWS)
def test_prop_groupby_null_aggregates(spark, rows):
    """sum/count(*)/count(v) agree on NULL-laden groups."""
    got = _sdf(spark, rows).groupBy("k").agg(
        F.sum("v").alias("sum_v"),
        F.count("*").alias("n"),
        F.count("v").alias("n_v"),
    ).toPandas()
    want = _duck(
        {"t": _pdf(rows)},
        "SELECT k, CAST(sum(v) AS BIGINT) AS sum_v, count(*) AS n,"
        " count(v) AS n_v FROM t GROUP BY k",
    )
    assert _norm(got) == _norm(want)


@SETTINGS
@given(rows=ROWS)
def test_prop_filter_three_valued_logic(spark, rows):
    """WHERE v > 0 drops NULLs identically (3-valued logic)."""
    got = _sdf(spark, rows).filter(F.col("v") > 0).toPandas()
    want = _duck({"t": _pdf(rows)}, "SELECT * FROM t WHERE v > 0")
    assert _norm(got) == _norm(want)


@SETTINGS
@given(rows=ROWS)
def test_prop_distinct(spark, rows):
    got = _sdf(spark, rows).distinct().toPandas()
    want = _duck({"t": _pdf(rows)}, "SELECT DISTINCT * FROM t")
    assert _norm(got) == _norm(want)


@SETTINGS
@given(left=ROWS, right=ROWS)
def test_prop_join_multiplicity(spark, left, right):
    """Inner equi-join duplicate-key multiplicities match."""
    ldf, rdf = _sdf(spark, left), _sdf(spark, right)
    got = (
        ldf.join(rdf.select(F.col("k"), F.col("v").alias("rv")), "k")
        .groupBy("k")
        .agg(F.count("*").alias("n_pairs"))
        .toPandas()
    )
    want = _duck(
        {"l": _pdf(left), "r": _pdf(right)},
        "SELECT l.k, count(*) AS n_pairs FROM l JOIN r USING (k) GROUP BY l.k",
    )
    assert _norm(got) == _norm(want)


@SETTINGS
@given(rows=ROWS)
def test_prop_window_null_ordering(spark, rows):
    """row_number with pinned NULLS FIRST ordering matches."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy(
        F.col("v").asc_nulls_first(), F.col("s"), F.col("_i")
    )
    sdf = _sdf(spark, rows).withColumn(
        "_i", F.monotonically_increasing_id()
    )
    # _i is engine-internal — use it only to break exact (v, s) ties
    # deterministically, then drop it; compare (k, v, s, rn) multisets.
    got = sdf.withColumn("rn", F.row_number().over(w)).drop("_i").toPandas()
    pdf = _pdf(rows).reset_index().rename(columns={"index": "_i"})
    want = _duck(
        {"t": pdf},
        "SELECT k, v, s, CAST(row_number() OVER (PARTITION BY k"
        " ORDER BY v ASC NULLS FIRST, s, _i) AS BIGINT) AS rn FROM t",
    )
    assert _norm(got) == _norm(want.drop(columns=["_i"], errors="ignore"))


@SETTINGS
@given(rows=ROWS)
def test_prop_string_exprs(spark, rows):
    """upper/length/concat_ws agree including on empty strings."""
    got = _sdf(spark, rows).select(
        F.upper("s").alias("u"),
        F.length("s").alias("ln"),
        F.concat_ws("-", "s", "s").alias("cc"),
    ).toPandas()
    want = _duck(
        {"t": _pdf(rows)},
        "SELECT upper(s) AS u, CAST(length(s) AS INTEGER) AS ln,"
        " concat_ws('-', s, s) AS cc FROM t",
    )
    assert _norm(got) == _norm(want)
