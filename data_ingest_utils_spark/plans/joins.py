"""SURVEY §2d — joins.

Scale notes inline per key; the common rules: dims get explicit
``broadcast()`` hints, fact-fact joins shuffle on equi-keys with AQE
skew handling, the as-of join is a window (one shuffle), and the theta
join keeps its equi component so the planner can sort-merge on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingest_utils_spark.operators.relational import (
    as_of_attach,
    as_of_attach_forward,
    join_dim,
    join_facts,
)
from data_ingest_utils_spark.plans.money import money_sum, money_sum_sql
from data_ingest_utils_spark.plans.registry import plan
from data_ingest_utils_spark.sources.readers import load_table


@plan(
    "join_inner_broadcast",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim equi join — broadcast hash join, zero fact shuffle."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return join_dim(n, r, n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@plan(
    "join_inner_shuffle",
    oracle="""
    SELECT l_orderkey, l_linenumber, o_custkey, o_totalprice
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def join_inner_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi join: both sides hash-partition on the key.
    100 TB: bucket both lake tables by orderkey to delete this shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return join_facts(li, o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_custkey", "o_totalprice"
    )


@plan(
    "join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return join_facts(c, o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@plan(
    "join_right",
    oracle="""
    SELECT c_custkey, c_mktsegment, o_orderkey
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return join_facts(o, c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_mktsegment", "o_orderkey"
    )


@plan(
    "join_full",
    oracle="""
    SELECT cn.c_nationkey, sn.s_nationkey
    FROM (SELECT DISTINCT c_nationkey FROM customer) cn
    FULL JOIN (SELECT DISTINCT s_nationkey FROM supplier) sn
      ON cn.c_nationkey = sn.s_nationkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with null extension on both sides."""
    cn = load_table(spark, sf_dir, "customer").select("c_nationkey").distinct()
    sn = load_table(spark, sf_dir, "supplier").select("s_nationkey").distinct()
    return join_facts(cn, sn, cn.c_nationkey == sn.s_nationkey, "full").select(
        "c_nationkey", "s_nationkey"
    )


@plan(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers having orders; no right columns, no dup
    amplification — the scalable EXISTS."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return join_facts(c, o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@plan(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return join_facts(c, o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@plan(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever sane between tiny dims (125 rows
    here); the LLM similarity ops deliberately avoid this shape."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@plan(
    "join_theta_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 30 DAY
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range theta join: the equi key keeps it a shuffle join
    (range applied as join residual), never a cartesian."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (li.l_orderkey == o.o_orderkey) & F.expr(
        "l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 30 DAYS"
    )
    return join_facts(li, o, cond).select(
        "l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate"
    )


@plan(
    "join_asof",
    oracle="""
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS asof_purchase_ts
    FROM events
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attach the most recent purchase at-or-before each
    event, per user.  Window formulation = ONE shuffle on user_id —
    the scale-correct phrasing (a range join would be quadratic per
    user; Spark has no native ASOF)."""
    ev = load_table(spark, sf_dir, "events")
    return as_of_attach(
        ev,
        ["user_id"],
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("ts")),
        "asof_purchase_ts",
        tiebreakers=["event_id"],
    ).select("event_id", "user_id", "ts", "asof_purchase_ts")


@plan(
    "join_multiway_star",
    oracle=f"""
    SELECT n_name,
           {money_sum_sql('l_extendedprice * (1 - l_discount)', 2)} AS revenue,
           count(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape 5-table star join: dims broadcast, facts shuffle
    once on orderkey; date filter pushed to the orders scan.

    Revenue uses :func:`money_sum` (round 13): the double-sum ROUND
    half-step flaked one cent at sf1.0 (PARITY_r12) — exact integer
    micro-unit accumulation is order-insensitive at any scale."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dim = join_dim(join_dim(c, n, c.c_nationkey == n.n_nationkey), r,
                   F.col("n_regionkey") == F.col("r_regionkey"))
    facts = join_facts(li, o, li.l_orderkey == o.o_orderkey)
    return (
        facts.join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@plan(
    "join_null_safe",
    oracle="""
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END
               AS status_key
      FROM orders
    ), r AS (
      SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END
               AS status_key,
             count(*) AS n_right
      FROM orders GROUP BY status_key
    )
    SELECT coalesce(l.status_key, '<null>') AS status_key,
           count(*) AS n_left, min(n_right) AS n_right
    FROM l JOIN r ON l.status_key IS NOT DISTINCT FROM r.status_key
    GROUP BY l.status_key
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (Spark ``<=>`` == SQL ``IS NOT DISTINCT
    FROM``): NULL keys match each other instead of vanishing — the
    semantics ingestion pipelines need when joining on nullable
    business keys after ing_standardize_nulls.  Nulls are injected
    in-plan (fixtures have none).  Null-safe equality remains a HASH
    join key in Spark (NULL hashes to a bucket like any value), so the
    plan is a plain shuffled/broadcast hash join — no fallback to a
    nested-loop."""
    orders = load_table(spark, sf_dir, "orders")
    status_key = F.when(
        F.col("o_orderstatus") == "P", F.lit(None)
    ).otherwise(F.col("o_orderstatus"))
    left = orders.select("o_orderkey", status_key.alias("status_key"))
    right = (
        orders.select(status_key.alias("status_key"))
        .groupBy("status_key")
        .agg(F.count("*").alias("n_right"))
    )
    joined = left.join(
        right.withColumnRenamed("status_key", "r_status_key"),
        F.col("status_key").eqNullSafe(F.col("r_status_key")),
    )
    return joined.groupBy("status_key").agg(
        F.count("*").alias("n_left"), F.min("n_right").alias("n_right")
    ).select(
        F.coalesce(F.col("status_key"), F.lit("<null>")).alias("status_key"),
        "n_left",
        "n_right",
    )


@plan(
    "join_range_banded",
    oracle="""
    WITH bands AS (
      SELECT CAST(i AS INTEGER) AS band_id,
             i * i * 140.0 AS lo, (i + 1) * (i + 1) * 140.0 AS hi
      FROM range(60) t(i)
    )
    SELECT o_orderkey, band_id
    FROM orders JOIN bands
      ON o_totalprice >= lo AND o_totalprice < hi
    """,
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join executed as an EQUI join: each
    (irregular-width) band is exploded into the fixed 10k-wide buckets
    it overlaps, the fact side computes its bucket with one floor(), and
    the exact lo<=p<hi predicate filters after the hash join.  This is
    the standard rewrite that turns a O(n·m) theta/BNLJ range join
    (the oracle's phrasing) into a shuffle-free broadcast hash join —
    at 100 TB the BNLJ is not runnable.  Bucket fan-out is bounded by
    ceil(band_width/10k)+1 rows per band on the TINY side only."""
    bucket_w = 10_000.0
    bands = (
        spark.range(60)
        .select(
            F.col("id").cast("int").alias("band_id"),
            (F.col("id") * F.col("id") * 140.0).alias("lo"),
            ((F.col("id") + 1) * (F.col("id") + 1) * 140.0).alias("hi"),
        )
        .select(
            "band_id",
            "lo",
            "hi",
            F.explode(
                F.sequence(
                    F.floor(F.col("lo") / bucket_w),
                    F.floor((F.col("hi") - 1e-9) / bucket_w),
                )
            ).alias("bucket"),
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.floor(F.col("o_totalprice") / bucket_w).alias("bucket"),
    )
    return (
        o.join(F.broadcast(bands), "bucket")
        .filter(
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi"))
        )
        .select("o_orderkey", "band_id")
    )


@plan(
    "join_asof_forward",
    oracle="""
    SELECT event_id, user_id, ts,
           first_value(CASE WHEN event_type = 'purchase' THEN ts END
                       IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS next_purchase_ts
    FROM events
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: attach the NEXT purchase at-or-after each
    event, per user — time-to-conversion's building block.  Same
    single-shuffle window formulation as join_asof (backward); Spark
    evaluates the following-frame first(ignoreNulls) in one pass."""
    ev = load_table(spark, sf_dir, "events")
    return as_of_attach_forward(
        ev,
        ["user_id"],
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("ts")),
        "next_purchase_ts",
        tiebreakers=["event_id"],
    ).select("event_id", "user_id", "ts", "next_purchase_ts")


@plan(
    "join_asof_nearest",
    oracle="""
    WITH bracketed AS (
      SELECT event_id, user_id, ts,
             last_value(CASE WHEN event_type = 'purchase' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_ts,
             first_value(CASE WHEN event_type = 'purchase' THEN ts END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_ts
      FROM events
    )
    SELECT event_id, user_id, ts,
           CASE WHEN prev_ts IS NULL THEN next_ts
                WHEN next_ts IS NULL THEN prev_ts
                WHEN (ts - prev_ts) <= (next_ts - ts) THEN prev_ts
                ELSE next_ts END AS nearest_purchase_ts
    FROM bracketed
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: bracket each event between its previous and next
    purchase (the two one-shuffle window passes share ONE partitioning
    on user_id — Spark reuses the exchange) and pick the closer side,
    ties to the earlier.  Completes the as-of family
    (backward/forward/nearest) without ever writing a range join."""
    ev = load_table(spark, sf_dir, "events")
    val = F.when(F.col("event_type") == "purchase", F.col("ts"))
    both = as_of_attach_forward(
        as_of_attach(ev, ["user_id"], "ts", val, "prev_ts", ["event_id"]),
        ["user_id"],
        "ts",
        val,
        "next_ts",
        ["event_id"],
    )
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(
            (F.col("ts") - F.col("prev_ts")) <= (F.col("next_ts") - F.col("ts")),
            F.col("prev_ts"),
        )
        .otherwise(F.col("next_ts"))
    )
    return both.select(
        "event_id", "user_id", "ts", nearest.alias("nearest_purchase_ts")
    )


@plan(
    "join_geo_grid",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             CAST((c_custkey * 7)  % 100 AS DOUBLE) AS px,
             CAST((c_custkey * 13) % 100 AS DOUBLE) AS py
      FROM customer
    ), qs AS (
      SELECT s_suppkey,
             CAST((s_suppkey * 11) % 100 AS DOUBLE) AS qx,
             CAST((s_suppkey * 17) % 100 AS DOUBLE) AS qy
      FROM supplier
    )
    SELECT c_custkey, s_suppkey,
           round(sqrt((px-qx)*(px-qx) + (py-qy)*(py-qy)), 6) AS dist
    FROM pts, qs
    WHERE (px-qx)*(px-qx) + (py-qy)*(py-qy) <= 9.0
    """,
)
def join_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D distance join via spatial grid bucketing — the spatial twin
    of join_range_banded: snap both sides to a d-wide grid, replicate
    the SMALL side to its 9 neighbor cells (a point within distance d
    of another is always in an adjacent cell), hash-join on the cell,
    then apply the exact Euclidean predicate as a residual.  The
    oracle's cross-join phrasing is O(n·m); the grid join shuffles on
    cell keys and is near-linear — at 100 TB this is geohash/S2-cell
    joining with stock Spark.  Coordinates are derived
    deterministically from the keys (no geo columns in the fixtures);
    swap in real lat/lon + haversine residual unchanged.

    The broadcast hint fits the supplier-dim fixture (small side even
    after 9× neighbor replication).  When BOTH sides are large, drop
    the hint and let the join shuffle on (cx, cy) — the grid join
    stays near-linear either way; only the distribution strategy
    changes (test_explain only requires non-cartesian, which holds
    for both)."""
    d = 3.0
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7) % 100).cast("double").alias("px"),
        ((F.col("c_custkey") * 13) % 100).cast("double").alias("py"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 11) % 100).cast("double").alias("qx"),
        ((F.col("s_suppkey") * 17) % 100).cast("double").alias("qy"),
    )
    pts = c.withColumn("cx", F.floor(F.col("px") / d)).withColumn(
        "cy", F.floor(F.col("py") / d)
    )
    offsets = F.expr(
        "explode(array(" + ",".join(
            f"struct({dx}L as dx, {dy}L as dy)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ) + "))"
    )
    cells = s.select("*", offsets.alias("o")).select(
        "s_suppkey", "qx", "qy",
        (F.floor(F.col("qx") / d) + F.col("o.dx")).alias("cx"),
        (F.floor(F.col("qy") / d) + F.col("o.dy")).alias("cy"),
    )
    sq = (F.col("px") - F.col("qx")) ** 2 + (F.col("py") - F.col("qy")) ** 2
    return (
        pts.join(F.broadcast(cells), ["cx", "cy"])
        .filter(sq <= d * d)
        .select(
            "c_custkey",
            "s_suppkey",
            F.round(F.sqrt(sq), 6).alias("dist"),
        )
    )


@plan(
    "join_asof_tolerance",
    oracle="""
    WITH att AS (
      SELECT event_id, user_id, ts,
             last_value(CASE WHEN event_type = 'purchase' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_ts
      FROM events
    )
    SELECT event_id, user_id, ts,
           -- exact interval comparison, matching Spark's exact
           -- (ts - prev_ts) <= INTERVAL test: date_diff('second')
           -- counts boundary crossings and would keep a stale match
           -- whose true gap is in (1800 s, 1801 s)
           CASE WHEN ts - prev_ts <= INTERVAL '30 minutes'
                THEN prev_ts END AS recent_purchase_ts
    FROM att
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a staleness tolerance (pandas
    ``merge_asof(tolerance=...)`` semantics): attach the most recent
    purchase at-or-before each event, but only when it happened within
    the last 30 minutes — older matches become NULL rather than
    leaking stale state.  Same single-shuffle running-last window as
    join_asof; the tolerance is a post-window null-out, so the plan
    cost is identical."""
    ev = load_table(spark, sf_dir, "events")
    att = as_of_attach(
        ev,
        ["user_id"],
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("ts")),
        "prev_ts",
        tiebreakers=["event_id"],
    )
    # NTZ-safe staleness test: timestamp subtraction yields a
    # day-time interval, comparable against an interval literal
    # (TIMESTAMP_NTZ admits no cast to numeric in Spark 4).
    within = (F.col("ts") - F.col("prev_ts")) <= F.expr(
        "INTERVAL '30' MINUTE"
    )
    return att.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("prev_ts")).alias("recent_purchase_ts"),
    )


@plan(
    "join_fuzzy_blocked",
    oracle="""
    SELECT c_custkey, s_suppkey, c_nationkey AS nationkey,
           levenshtein(substr(c_name, 10), substr(s_name, 10)) AS dist
    FROM customer JOIN supplier ON c_nationkey = s_nationkey
    WHERE levenshtein(substr(c_name, 10), substr(s_name, 10)) <= 1
    """,
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy (entity-resolution) join: candidate pairs come
    from an exact equi-join on a cheap blocking key (nationkey), and
    only those pairs pay the expensive edit-distance predicate —
    never a cross join.  The classic two-stage record-linkage shape:
    at 100 TB the blocking key (sorted-neighborhood bucket, phonetic
    code, name prefix) bounds the pair space to sum-of-block-squares
    while the residual predicate does exact matching within blocks.
    The match field is the entity id digits (both fixture name pools
    share the zero-padded numeric tail); Spark's thresholded
    ``levenshtein(l, r, k)`` would short-circuit past k at scale —
    spelled unthresholded here so the oracle's CASE-free predicate
    is bit-identical.  Supplier is the small side of every block:
    broadcast, so the fact side never shuffles."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("substr(c_name, 10)").alias("_ct"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        F.expr("substr(s_name, 10)").alias("_st"),
    )
    # On the VERDICT r10 nit (levenshtein appears in both filter and
    # projection): the "project once, then filter the column" rewrite
    # is a NO-OP here — PushDownPredicates re-inlines the aliased
    # expression into the join condition (verified on the optimized
    # plan: the filter lands INSIDE the BroadcastHashJoin either way,
    # and the output projection re-states the expression for the
    # survivors).  That placement is the better trade: every candidate
    # pair pays ONE evaluation inside the join (non-matches are
    # dropped before materialization), and only the few SURVIVING
    # pairs pay the second evaluation in the projection — |survivors|
    # extra evals, vs |candidates| extra if pushdown were suppressed.
    # Spelled as withColumn + column refs so intent reads clearly;
    # the optimized plan is identical to the inline-expression form.
    return (
        c.join(F.broadcast(s), c["c_nationkey"] == s["s_nationkey"])
        .withColumn("dist", F.levenshtein("_ct", "_st"))
        .filter(F.col("dist") <= 1)
        .select(
            "c_custkey",
            "s_suppkey",
            F.col("c_nationkey").alias("nationkey"),
            "dist",
        )
    )
