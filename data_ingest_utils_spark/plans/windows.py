"""SURVEY §2f — window functions.

Every window order ends in a unique tiebreaker (SURVEY §7 determinism
rule).  Running/rolling float results are computed in a deterministic
frame order on both engines, but still ROUND(…, 6) per contract.

100 TB: windows shuffle once on their partition keys; the global-order
windows (win_ntile) are flagged — a single-partition sort does not
scale, production uses bucketed quantiles (approx_percentile) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingest_utils_spark.operators.relational import ranked, topk_per_group
from data_ingest_utils_spark.plans.registry import plan
from data_ingest_utils_spark.sources.readers import load_table
from data_ingest_utils_spark.streaming.transforms import (
    EPOCH_SECONDS as _EPOCH_SECONDS,  # floor-exact single source
)


@plan(
    "win_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return ranked(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        F.row_number, "rn",
    ).select("o_custkey", "o_orderkey", "rn")


@plan(
    "win_rank",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS INTEGER) AS rnk
    FROM part
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() with real ties (p_size) — gap semantics; deterministic
    without a tiebreaker because equal keys get equal ranks."""
    p = load_table(spark, sf_dir, "part")
    return ranked(
        p, ["p_brand"], [F.col("p_size").desc()], F.rank, "rnk"
    ).select("p_brand", "p_partkey", "p_size", "rnk")


@plan(
    "win_dense_rank",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS INTEGER) AS drnk
    FROM part
    """,
)
def win_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return ranked(
        p, ["p_brand"], [F.col("p_size").desc()], F.dense_rank, "drnk"
    ).select("p_brand", "p_partkey", "p_size", "drnk")


@plan(
    "win_ntile",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
    FROM customer
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quartiles of account balance.  NOTE (100 TB): an
    unpartitioned window is a single-task sort — fine for a 15k-row
    dim, wrong for facts; use approx_percentile buckets there."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return c.select("c_custkey", F.ntile(4).over(w).alias("quartile"))


@plan(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           round(value - lag(value) OVER w, 6) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    )


@plan(
    "win_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS run_total
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey", "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 6).alias("run_total"),
    )


@plan(
    "win_moving_avg_range",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 6) AS mov_avg
    FROM events
    """,
)
def win_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour average per user — RANGE frame on epoch seconds
    (tz-independent via the NTZ epoch anchor; DuckDB side floors
    epoch() to the same integer seconds)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "_sec", F.expr(_EPOCH_SECONDS.format(col="ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("mov_avg")
    )


@plan(
    "win_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderdate) OVER w AS first_dt,
           last_value(o_orderdate)  OVER w AS last_dt
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey", "o_custkey",
        F.first("o_orderdate").over(w).alias("first_dt"),
        F.last("o_orderdate").over(w).alias("last_dt"),
    )


@plan(
    "win_topk_per_group",
    oracle="""
    SELECT user_id, event_id, value, CAST(rn AS INTEGER) AS rn FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events) WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per user.  Spark plans WindowGroupLimit:
    the k-limit is pushed below the full window sort — the phrasing
    that survives 100 TB (never collect-and-slice)."""
    ev = load_table(spark, sf_dir, "events")
    return topk_per_group(
        ev, ["user_id"], [F.col("value").desc(), F.col("event_id")], 3, "rn"
    ).select("user_id", "event_id", "value", "rn")


@plan(
    "win_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_order,
           round(percent_rank() OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 6)
             AS pr
    FROM orders
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over an explicit unbounded ROWS frame (both engines
    default nth_value to a growing frame, which would leave the first
    row NULL) plus percent_rank.  One shuffle on o_custkey serves both
    window specs."""
    o = load_table(spark, sf_dir, "orders")
    order_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full_w = order_w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(full_w).alias("second_order"),
        F.round(F.percent_rank().over(order_w), 6).alias("pr"),
    )


@plan(
    "win_session_id",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER w <= INTERVAL '30 minutes'
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(sum(new_session) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
             AS session_id
    FROM gaps
    """,
)
def win_session_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization as pure window algebra (lag → gap flag
    → running sum), the batch twin of evt_session's session_window.
    Both windows share one shuffle on user_id; state is O(1) per row —
    this is the formulation that scales to 100 TB event logs because
    it never materializes per-session buffers.  The first row of each
    user flags new_session=1 (NULL gap ⇒ ELSE branch), so ids start
    at 1 on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # MICROSECOND-exact gap (long arithmetic): the oracle compares
    # exact intervals, and a whole-second-truncated epoch would
    # misclassify true gaps in (1800 s, 1801 s) as within-session
    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    gap_ok = (epoch_us - F.lag(epoch_us).over(w)) <= 1_800_000_000
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)).alias("new_session"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("new_session").over(w).alias("session_id"),
    )


@plan(
    "win_gap_islands",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    i AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INT) AS grp
      FROM d
    ),
    s AS (SELECT user_id, grp, count(*) AS len FROM i GROUP BY 1, 2)
    SELECT len, count(*) AS n_streaks FROM s GROUP BY len ORDER BY len
    """,
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS (round 15) — consecutive-run detection, the
    named classic behind activity streaks, sensor-uptime segments,
    and inventory coverage windows: group each user's DISTINCT
    activity days into maximal runs of consecutive dates via the
    date-minus-row_number trick (consecutive days share a constant
    ``d − rn``), then roll the per-user streak lengths into a
    corpus-wide streak-length histogram.  The calendar-grid sibling
    of :func:`win_session_id`'s gap-threshold sessionization: session
    ids segment a CONTINUOUS timeline by inactivity gaps, islands
    segment a DISCRETE grid by missing cells — the row_number
    constant-group trick has no session_window equivalent.

    100 TB shape: the distinct collapses raw events to user-days
    (map-side combinable), the window shuffles ONCE on user_id (AQE
    coalesces the distinct's hash exchange into it at runtime since
    the keys are compatible), the island agg reuses the window's
    partitioning, and only the tiny histogram hits the final
    single-partition agg.  Every ordering is unique by construction
    (distinct days within a user) so both engines' row_numbers agree
    deterministically."""
    d = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = d.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return (
        streaks.groupBy("len")
        .agg(F.count("*").alias("n_streaks"))
        .orderBy("len")
    )
