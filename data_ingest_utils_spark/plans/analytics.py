"""Relational analytics extensions beyond SURVEY §2's core tables:
pivot/unpivot reshaping, exact interpolated percentiles, distribution
window functions, skew-salted joins, stratified sampling.

All declarative DataFrame API — Catalyst keeps pushdown/pruning/AQE in
play; float outputs are ROUND(…, 6) on both sides (SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingest_utils_spark.operators.relational import (
    salted_join,
    salted_join_hotkeys,
)
from data_ingest_utils_spark.plans.money import money_sum, money_sum_sql
from data_ingest_utils_spark.plans.registry import plan
from data_ingest_utils_spark.sources.readers import load_table


@plan(
    "agg_pivot",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
    FROM orders GROUP BY o_year
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts to one column per status.  Pinned pivot
    values (no discovery scan) — at 100 TB an unpinned pivot runs an
    extra distinct over the pivot column; pinning makes it one pass."""
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy(F.year("o_orderdate").alias("o_year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_year",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"{s.lower()}_cnt")
            for s in ("F", "O", "P")
        ],
    )


@plan(
    "agg_unpivot",
    oracle=f"""
    SELECT l_returnflag, metric,
           {money_sum_sql('v', 2)} AS sum_value, count(*) AS n
    FROM (
      SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS v FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
    ) GROUP BY l_returnflag, metric
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) three measure columns to long form and
    re-aggregate.  ``unpivot`` is a zero-shuffle row expansion; the
    single shuffle is the final group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "v",
    )
    # exact micro-unit accumulation (plans/money.py, round 13): the
    # l_extendedprice slice is ~2.5e10 at sf1 — the money half-step
    # class; quantity/discount slices quantize exactly at 1e-6
    return long.groupBy("l_returnflag", "metric").agg(
        money_sum(F.col("v")).alias("sum_value"), F.count("*").alias("n")
    )


@plan(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
           round(quantile_cont(l_quantity, 0.50), 6)      AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark
    ``percentile`` == DuckDB ``quantile_cont``).  100 TB: exact
    percentile gathers per-group values — swap to
    ``percentile_approx`` (t-digest sketch, mergeable map-side) when
    groups stop fitting; same plan shape, bounded memory."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE percentile aggregate with an array of percentages shares a
    # single per-group value buffer across the four l_extendedprice
    # cuts — five scalar percentile() calls each gathered the full
    # group independently (5× the agg memory and merge work; measured
    # 0.89 → 0.32 s at sf0.1, identical output).
    ps = F.percentile(
        F.col("l_extendedprice"),
        F.array(*[F.lit(p) for p in (0.25, 0.50, 0.75, 0.95)]),
    )
    return (
        li.groupBy("l_returnflag")
        .agg(ps.alias("_ps"),
             F.percentile(F.col("l_quantity"), F.lit(0.5)).alias("_mq"))
        .select(
            "l_returnflag",
            F.round(F.element_at("_ps", 1), 6).alias("p25"),
            F.round(F.element_at("_ps", 2), 6).alias("p50"),
            F.round(F.element_at("_ps", 3), 6).alias("p75"),
            F.round(F.element_at("_ps", 4), 6).alias("p95"),
            F.round("_mq", 6).alias("median_qty"),
        )
    )


@plan(
    "win_cume_dist",
    oracle="""
    SELECT event_id, event_type,
           round(percent_rank() OVER (PARTITION BY event_type ORDER BY value), 6)
             AS pct_rank,
           round(cume_dist() OVER (PARTITION BY event_type ORDER BY value), 6)
             AS cum_dist
    FROM events
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank + cume_dist per
    event type.  Tied ``value`` rows get identical outputs in both
    engines, so no tiebreaker is needed for hash parity.

    100 TB WARNING: the partition key (event_type) is low-cardinality,
    so each window partition is a full sort of ~1/5 of the table on
    one reducer.  At scale, sub-partition first (e.g. per day) or
    replace with an approximate CDF (percentile_approx buckets +
    broadcast lookup) — same output contract, bounded partitions."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


@plan(
    "join_skew_salted",
    oracle=f"""
    SELECT o_orderstatus, count(*) AS n,
           {money_sum_sql('l_extendedprice', 2)} AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigating salted equi-join: the fact side gets a
    deterministic salt, the build side is replicated salt_mod times, so
    one hot key spreads over salt_mod shuffle partitions.  The oracle
    is the UNSALTED join — salting must be result-invariant.  Sums
    accumulate in exact integer micro-units (plans/money.py, round
    13): salting reorders the accumulation vs the oracle's single
    join, which is exactly the order-sensitivity the integer path
    removes — the hash match is now scale-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    joined = salted_join(
        li.select("l_orderkey", "l_partkey", "l_linenumber", "l_extendedprice"),
        orders,
        left_key="l_orderkey",
        right_key="o_orderkey",
        # l_partkey+l_linenumber: l_linenumber alone has only 7 values
        # (at most 7 of 8 salt buckets, ~7:1 imbalance) — the salt must
        # come from high-cardinality sources for the hot key to spread
        salt_src=["l_partkey", "l_linenumber"],
        salt_mod=8,
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        money_sum(F.col("l_extendedprice")).alias("sum_price"),
    )


@plan(
    "join_skew_stress",
    oracle=f"""
    WITH skewed AS (
      SELECT CASE WHEN l_linenumber % 3 = 0 THEN 1 ELSE l_orderkey END AS k,
             l_extendedprice
      FROM lineitem
    )
    SELECT o_orderstatus, count(*) AS n,
           {money_sum_sql('l_extendedprice', 2)} AS sum_price
    FROM skewed JOIN orders ON k = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_skew_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PATHOLOGICAL-skew salted join — the hot-key stress shape the
    plain fixture can't produce (TPC-H lineitem is near-uniform,
    1–7 rows/order).  A deterministic in-plan remap pools every
    ``l_linenumber % 3 = 0`` row (~29% of the fact table — 1.7 M rows
    at sf1.0) onto ONE order key, the single-key-bigger-than-a-
    partition case AQE skew-join cannot split when the downstream agg
    needs the join key's clustering.  ``salted_join_hotkeys``
    (salt_mod=32, salt hashed from l_partkey+l_linenumber —
    high-cardinality sources, so the hot key's rows spread across all
    32 salts) salts ONLY the hot key: the dim replicates 32 hot rows
    (cold dim rows carry the one constant salt), and since the
    round-13 single-scan rewrite the whole thing is ONE (key, salt)
    equi-join over ONE fact scan — no hot/cold branch split or union.
    The per-salt bound is asserted in tests/test_invariants.py and the
    oracle is the UNSALTED remapped join, so the driver hash-match
    certifies salting is result-invariant (sums in exact integer
    micro-units — plans/money.py, round 13).  Benchable at sf1.0
    (bench.py HEAVY_SF1) — the in-plan remap makes the same stress
    reproducible at every sf dir, fixture-free."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_linenumber") % 3 == 0, F.lit(1).cast("long"))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_linenumber",
        "l_partkey",
        "l_extendedprice",
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    joined = salted_join_hotkeys(
        li,
        orders,
        left_key="k",
        right_key="o_orderkey",
        hot_keys=[1],
        salt_src=["l_partkey", "l_linenumber"],
        salt_mod=32,
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        money_sum(F.col("l_extendedprice")).alias("sum_price"),
    )


@plan("sel_sample_stratified")  # rows-only: sampling is RNG-dependent
def sel_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified ~10% sample per returnflag (seeded Bernoulli per
    stratum) — the standard dev-subset generator for a 100 TB table;
    per-stratum counts returned for the rate invariant check."""
    li = load_table(spark, sf_dir, "lineitem")
    sampled = li.sampleBy(
        "l_returnflag", {"A": 0.1, "N": 0.1, "R": 0.1}, seed=42
    )
    return sampled.groupBy("l_returnflag").agg(F.count("*").alias("n_sampled"))


@plan("agg_hll_union")  # rows-only: sketch binaries are engine-specific
def agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches): per-returnflag
    sketches of l_orderkey, merged with hll_union_agg into a global
    distinct estimate.

    This is THE 100 TB distinct-count pattern: sketches aggregate
    map-side, merge associatively across partitions/days, and persist
    as tiny binaries for later rollup — no re-scan to recount.  Error
    bound asserted against exact counts in tests/test_invariants.py.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk"),
        F.count("*").alias("n_rows"),
    )
    return per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct_orders"),
        F.sum("n_rows").alias("n_rows"),
    )


@plan(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
           count(*) AS n,
           round(avg(l_discount), 6) AS avg_discount
    FROM lineitem GROUP BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of l_extendedprice (5000-wide buckets)
    with a per-bucket companion stat.  The bucket id is derived
    arithmetic (floor(x/width) — exact in both engines, unlike the
    engine-specific width_bucket functions), so the whole histogram is
    ONE map-side-combinable hash aggregation: the 100 TB shape for any
    distribution profile."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.floor(F.col("l_extendedprice") / 5000).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("l_discount"), 6).alias("avg_discount"),
        )
    )


@plan(
    "agg_corr_regr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6) AS corr_price_qty,
           round(covar_samp(l_extendedprice, l_quantity), 4) AS covar_s,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: correlation, sample covariance,
    and the OLS regression family (slope/intercept/r2/count) — all
    single-pass streaming aggregates (Welford-style moment updates)
    that combine map-side and merge associatively across partitions:
    the same plan shape as a sum at 100 TB.  Bounded stats ([-1,1])
    round 6 dp; unbounded moments 4 dp (their accumulation-order error
    scales with magnitude — SURVEY §7 float rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(y, x), 6).alias("corr_price_qty"),
        F.round(F.covar_samp(y, x), 4).alias("covar_s"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
    )


@plan(
    "agg_mode",
    oracle="""
    WITH counted AS (
      SELECT l_returnflag, l_quantity, count(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_quantity
    )
    SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_count
    FROM (
      SELECT l_returnflag, l_quantity, n,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, l_quantity) AS rk
      FROM counted
    ) WHERE rk = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value) per group.  Spark has
    F.mode() but its tie-break is unspecified, so the engine uses the
    count + rank phrasing with an explicit smallest-value tie-break —
    hash-reproducible on both engines.  Scale shape: one hash agg on
    (group, value) then WindowGroupLimit rank-1 per group; never a
    per-group collect."""
    li = load_table(spark, sf_dir, "lineitem")
    counted = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("n"), F.asc("l_quantity")
    )
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("n").alias("mode_count"),
        )
    )


@plan(
    "agg_arg_minmax",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey DESC) AS rb,
             row_number() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice ASC, o_orderkey ASC) AS rw
      FROM orders
    )
    SELECT o_orderpriority,
           max(CASE WHEN rb = 1 THEN o_orderkey END) AS best_key,
           round(max(CASE WHEN rb = 1 THEN o_totalprice END), 6) AS best_price,
           max(CASE WHEN rw = 1 THEN o_orderkey END) AS worst_key,
           round(max(CASE WHEN rw = 1 THEN o_totalprice END), 6) AS worst_price
    FROM ranked GROUP BY o_orderpriority
    """,
)
def agg_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin per group.  Spark's max_by/min_by leave ties
    unspecified, so the engine orders a struct — max(struct(price, key))
    is lexicographic and therefore a deterministic (price, key) argmax.
    One map-side-combinable hash agg, no window, no second shuffle (the
    oracle's window phrasing is for DuckDB only)."""
    o = load_table(spark, sf_dir, "orders")
    best = F.max(F.struct("o_totalprice", "o_orderkey")).alias("b")
    worst = F.min(F.struct("o_totalprice", "o_orderkey")).alias("w")
    return (
        o.groupBy("o_orderpriority")
        .agg(best, worst)
        .select(
            "o_orderpriority",
            F.col("b.o_orderkey").alias("best_key"),
            F.round("b.o_totalprice", 6).alias("best_price"),
            F.col("w.o_orderkey").alias("worst_key"),
            F.round("w.o_totalprice", 6).alias("worst_price"),
        )
    )


@plan(
    "agg_bool",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 1)   AS all_multi,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           CAST(count_if(l_tax = 0) AS BIGINT) AS zero_tax_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and / bool_or / count_if) — short-
    circuitable predicates pushed into a map-side-combinable hash agg.
    DuckDB's count_if returns HUGEINT, cast to BIGINT to match Spark's
    long."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 1).alias("all_multi"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.count_if(F.col("l_tax") == 0).alias("zero_tax_rows"),
    )


@plan(
    "agg_skew_kurt",
    oracle="""
    WITH s AS (
      SELECT l_returnflag, avg(l_extendedprice) AS mu,
             stddev_pop(l_extendedprice) AS sdp,
             var_pop(l_extendedprice) AS vp
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           round(avg((l_extendedprice - mu) ^ 3) / any_value(sdp ^ 3), 6)
             AS skew,
           round(avg((l_extendedprice - mu) ^ 4) / any_value(vp ^ 2) - 3, 6)
             AS kurt
    FROM lineitem l JOIN s USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment aggregates.  Spark's skewness/kurtosis are the
    POPULATION (biased) estimators m3/m2^1.5 and m4/m2^2−3; DuckDB's
    built-ins are the sample-corrected ones, so the oracle spells out
    the raw-moment formulas instead of naming the functions.  Spark
    side stays one single-pass hash agg (moment sketches merge
    map-side); the oracle's two-pass join is DuckDB-only."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_extendedprice"), 6).alias("skew"),
        F.round(F.kurtosis("l_extendedprice"), 6).alias("kurt"),
    )
