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


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
@SETTINGS
def test_prop_zorder_interleave_bijective(spark, pairs):
    """Morton interleave (sort_zorder_layout's _ZVAL_EXPR shape): the
    z-value round-trips — de-interleaving even/odd bits recovers (a, b)
    exactly for the full 8-bit × 8-bit domain, so range-clustering on
    zval never conflates two distinct key pairs."""
    from data_ingest_utils_spark.plans.sorts_sets import _ZVAL_EXPR

    df = spark.createDataFrame(pairs, "l_orderkey long, l_partkey long")
    out = df.select(
        "l_orderkey", "l_partkey", F.expr(_ZVAL_EXPR).alias("z")
    ).collect()
    for r in out:
        a = sum(((r.z >> (2 * i)) & 1) << i for i in range(8))
        b = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (a, b) == (r.l_orderkey, r.l_partkey)
    zs = [r.z for r in out]
    assert len(set(zs)) == len(zs)


@given(
    vals=st.lists(
        st.tuples(st.integers(-100, 100), st.one_of(st.none(), st.integers(-100, 100))),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_prop_flatten_structs_lossless(spark, vals):
    """flatten_structs: rebuilding the nested struct from the flattened
    leaves reproduces the original rows, including NULL leaves."""
    from data_ingest_utils_spark.operators.ingest import flatten_structs

    df = spark.createDataFrame(vals, "x long, y long").select(
        "x", F.struct(F.col("x").alias("a"), F.struct(F.col("y").alias("b")).alias("n")).alias("s")
    )
    flat = flatten_structs(df)
    assert flat.columns == ["x", "s_a", "s_n_b"]
    nkey = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    orig = sorted(((r.x, r.s.a, r.s.n.b) for r in df.collect()), key=nkey)
    back = sorted(((r.x, r.s_a, r.s_n_b) for r in flat.collect()), key=nkey)
    assert orig == back


@given(
    ns=st.lists(st.integers(0, 5000), min_size=1, max_size=30),
    seq_len=st.sampled_from([1, 7, 2048]),
)
@SETTINGS
def test_prop_packing_conserves_tokens(spark, ns, seq_len):
    """explode_packed_sequences: per-doc contributions sum back to the
    doc token count, every sequence but the last is exactly full,
    zero-token docs emit no rows (the empty-range guard), and seq ids
    are the contiguous range the total implies."""
    from data_ingest_utils_spark.operators.text import explode_packed_sequences

    cum, rows = 0, []
    for i, n in enumerate(ns):
        cum += n
        rows.append((i, n, cum))
    t = spark.createDataFrame(rows, "doc_id long, n long, cum long")
    out = explode_packed_sequences(t, id_col="doc_id", seq_len=seq_len).toPandas()
    total = sum(ns)
    per_doc = out.groupby("doc_id").n_tokens_in_seq.sum()
    for i, n in enumerate(ns):
        assert per_doc.get(i, 0) == n
    assert set(out[out.n_tokens_in_seq > 0].doc_id) == {
        i for i, n in enumerate(ns) if n > 0
    }
    if total:
        per_seq = out.groupby("seq_id").n_tokens_in_seq.sum().sort_index()
        assert list(per_seq.index) == list(range((total - 1) // seq_len + 1))
        assert (per_seq.iloc[:-1] == seq_len).all()
        assert 0 < per_seq.iloc[-1] <= seq_len
    else:
        assert out.empty
