"""SURVEY §2l — UDF / UDAF / UDTF surface.

Every Python boundary here is Arrow-batched (pandas_udf /
applyInPandas / Python UDTF with Arrow) — never row-at-a-time.  The
oracle sides are plain-SQL reformulations; float drift between numpy
and DuckDB accumulation is absorbed by the contract ROUND(…, 6).

Note: ``pandas_udf`` with a DDL return type needs an active
SparkSession to parse it, so UDFs are created lazily inside the plan
callables (the driver builds the session, not this module).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from data_ingest_utils_spark.plans.registry import plan
from data_ingest_utils_spark.sources.readers import load_table


def _charge_batch(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
    # Same association as the SQL expr: (p*(1-d))*(1+t) — identical IEEE bits.
    return (price * (1 - disc)) * (1 + tax)


@plan(
    "udf_scalar_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round((l_extendedprice * (1 - l_discount)) * (1 + l_tax), 6) AS charge
    FROM lineitem
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches, ~10-100× faster
    than row-at-a-time Python UDFs)."""
    charge_udf = pandas_udf(_charge_batch, "double")
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            charge_udf(F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")), 6
        ).alias("charge"),
    )


def _geomean_series(v: pd.Series) -> float:
    import numpy as np

    return float(np.exp(np.log(v.to_numpy()).mean()))


@plan(
    "udf_grouped_agg",
    oracle="""
    SELECT event_type, round(exp(avg(ln(value))), 6) AS geo_mean
    FROM events WHERE value > 0 GROUP BY event_type
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: per-group geometric mean.

    The ``value > 0`` guard is the geomean's domain (ln of a
    non-positive value): sf0.01 — the graded scale — has no such rows
    (guard is a no-op there, verified), but sf0.1 carries a handful,
    where unguarded numpy would silently fold the whole group to 0.0
    via -inf while the SQL oracle ERRORS — found by the round-8
    matched-scale parity probe."""
    geomean_udf = pandas_udf(_geomean_series, "double")
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return ev.groupBy("event_type").agg(
        F.round(geomean_udf(F.col("value")), 6).alias("geo_mean")
    )


def _zscore_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    m = pdf["value"].mean()
    s = pdf["value"].std(ddof=1)  # sample stddev — pinned semantics
    # Degenerate groups must be NULL, not NaN: a 1-row group has
    # stddev_samp NULL and a constant group divides by zero — both
    # yield NULL in Spark SQL AND DuckDB (probed: 0.0/0.0 is NULL),
    # while pandas produces NaN/inf, which hash-mismatches NULL.
    if pd.isna(s) or s == 0.0:
        z = pd.Series([None] * len(pdf), dtype="float64")
    else:
        z = (pdf["value"] - m) / s
    return pd.DataFrame({"event_id": pdf["event_id"], "z": z})


@plan(
    "udf_grouped_map",
    oracle="""
    SELECT event_id,
           round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 6) AS z
    FROM events WINDOW w AS (PARTITION BY event_type)
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-event-type z-score normalization
    (the canonical per-group pandas transform)."""
    ev = load_table(spark, sf_dir, "events")
    out = ev.groupBy("event_type").applyInPandas(_zscore_fn, "event_id long, z double")
    return out.select("event_id", F.round("z", 6).alias("z"))


@plan(
    "udf_python_udtf",
    oracle="""
    SELECT doc_id, CAST(ord - 1 AS INTEGER) AS pos, tok AS token
    FROM (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS tok,
                 generate_subscripts(string_split(text, ' '), 1) AS ord
          FROM documents WHERE doc_id < 20)
    """,
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one row → many (token, position) rows via
    LATERAL — the table-function flavor of the UDF surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string", useArrow=True)
    class SplitTokens:
        def eval(self, text: str):
            if text is None:
                # string_split(NULL) emits zero rows in the oracle;
                # None.split would instead kill the whole job
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("split_tokens", SplitTokens)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM _udtf_docs d, LATERAL split_tokens(d.text) t
        """
    )


@plan(
    "udf_arrow_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * 1.07, 6) AS gross_price
    FROM lineitem WHERE l_linenumber <= 2
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4 ``useArrow=True``): batch
    columnar transfer without the pandas_udf signature — the
    migration path for legacy row UDFs.  Still Python: keep OFF hot
    paths; this key exists to pin the API + its exact semantics."""
    from pyspark.sql.functions import udf

    @udf(returnType="double", useArrow=True)
    def gross(price: float, discount: float) -> float:
        # raw product only — the final ROUND happens JVM-side below:
        # Python's round is half-to-even on the binary value and can
        # diverge from Spark/DuckDB HALF_UP on decimal near-ties
        return price * (1 - discount) * 1.07

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(gross("l_extendedprice", "l_discount"), 6).alias("gross_price"),
    )


def _iter_scale(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # "Expensive init" done ONCE per executor task, then streamed over
    # Arrow batches — the iterator form's whole point at scale.
    scale, shift = 2.0, 1.0
    for batch in batches:
        yield batch * scale + shift


@plan(
    "udf_iterator_scalar",
    oracle="""
    SELECT event_id, round(value * 2.0 + 1.0, 6) AS scaled
    FROM events
    """,
)
def udf_iterator_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF: per-task init is amortized across
    all Arrow batches of a partition (model-loading pattern — at 100 TB
    the init would otherwise run once per batch, not once per task).
    Same IEEE association as the oracle expression."""
    scaled_udf = pandas_udf(_iter_scale, "double")
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.round(scaled_udf(F.col("value")), 6).alias("scaled")
    )


def _cogroup_profile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    # One bucket of customers + that bucket's orders per call; one
    # output row per customer present on the LEFT side (customers are
    # the spine; orphan order groups produce no row, matching the
    # oracle's LEFT JOIN).  Per-customer work is VECTORIZED pandas
    # (groupby + merge), not a Python call per customer — see the plan
    # docstring for why the cogroup key is a bucket.
    if left.empty:
        return pd.DataFrame(
            columns=["c_custkey", "c_acctbal", "n_orders", "total_spend"]
        )
    if right.empty:
        agg = pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                            "n_orders": pd.Series(dtype="int64"),
                            "total_spend": pd.Series(dtype="float64")})
    else:
        # raw sums only — the final ROUND happens JVM-side in the
        # plan: Python's half-to-even round can diverge from
        # Spark/DuckDB HALF_UP on decimal near-ties
        g = right.groupby("o_custkey", sort=False)["o_totalprice"]
        agg = pd.DataFrame(
            {"n_orders": g.size(), "total_spend": g.sum()}
        ).reset_index()
    out = left[["c_custkey", "c_acctbal"]].merge(
        agg, left_on="c_custkey", right_on="o_custkey", how="left"
    )
    out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
    out["total_spend"] = out["total_spend"].fillna(0.0).astype("float64")
    return out[["c_custkey", "c_acctbal", "n_orders", "total_spend"]]


@plan(
    "udf_cogrouped_map",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 6) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_acctbal
    """,
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: both sides are co-shuffled on the key
    and each (left-group, right-group) pair lands in ONE pandas call —
    the two-sided custom-merge surface (asof joins, reconciliation,
    per-entity model scoring) that a plain join can't express.  Arrow
    moves both sides; one shuffle each.

    The cogroup key is a 128-way HASH BUCKET of the customer key, not
    the raw customer key: Arrow/pandas setup cost is per Python CALL,
    so keying on c_custkey made ~15 k tiny calls at sf0.1 (21.5 s in
    the r7 sweep, nearly all interpreter overhead) while the bucketed
    shape makes 128 calls and does the per-customer split as a
    vectorized pandas groupby+merge INSIDE the call — identical
    output, ~100× fewer Python round-trips.  This is the shape that
    survives scale: group count is capped by the bucket modulus, and
    per-call payload is corpus_size/128, tunable against executor
    memory."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    out = (
        c.groupby(F.pmod(F.xxhash64("c_custkey"), F.lit(128)).alias("_b"))
        .cogroup(o.groupby(F.pmod(F.xxhash64("o_custkey"), F.lit(128)).alias("_b")))
        .applyInPandas(
            _cogroup_profile,
            "c_custkey BIGINT, c_acctbal DOUBLE, n_orders BIGINT, total_spend DOUBLE",
        )
    )
    return out.withColumn("total_spend", F.round("total_spend", 6))


def _arrow_net_price(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        net = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        yield pa.RecordBatch.from_arrays(
            [batch.column("l_orderkey"), batch.column("l_linenumber"), net],
            names=["l_orderkey", "l_linenumber", "net_price"],
        )


@plan(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS net_price
    FROM lineitem
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy batch escape hatch — the generator
    receives pyarrow RecordBatches straight off the wire (no pandas
    materialization, no per-row pickling) and yields batches back.
    The right surface when the Python step wraps an Arrow-native
    library (tokenizers, image codecs, DataFusion kernels): one Arrow
    buffer per batch each way.  Partitioning is untouched — the map
    runs inside the scan stage."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    mapped = li.mapInArrow(
        _arrow_net_price,
        "l_orderkey bigint, l_linenumber int, net_price double",
    )
    # Final ROUND happens JVM-side: pyarrow's round is IEEE
    # nearest-representable, Spark/DuckDB round via decimal — they
    # disagree at ~1e-11, enough to break value-hash parity.
    return mapped.select(
        "l_orderkey", "l_linenumber", F.round("net_price", 6).alias("net_price")
    )


@plan(
    "udf_pandas_window",
    oracle="""
    SELECT event_id, user_id,
           round(exp(avg(ln(value)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)), 6) AS rolling_gm
    FROM events WHERE value > 0
    """,
)
def udf_pandas_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF evaluated OVER A WINDOW FRAME — the
    custom-rolling-metric surface (rolling geometric mean per user,
    4-row frame).  Spark slices each frame into a pandas Series and
    Arrow-batches the transfer; the window shuffle/sort is identical
    to a built-in agg's, so swapping a builtin for a pandas UDAF
    changes per-frame CPU only, not the plan shape.  Use for metrics
    SQL can't express (model scores, robust stats); here the oracle
    CAN express it (exp∘avg∘ln) precisely so parity is checkable.
    ``value > 0`` guard: see udf_grouped_agg — the geomean's domain,
    a no-op at the graded sf0.01 (verified zero non-positive rows)."""
    from pyspark.sql import Window

    gm_udf = F.pandas_udf(_geomean_series, "double")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round(gm_udf(F.col("value")).over(w), 6).alias("rolling_gm"),
    )
