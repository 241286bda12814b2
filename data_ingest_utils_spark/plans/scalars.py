"""SURVEY §2i — scalar function coverage (string / date / math / case /
array / JSON / struct), exercised as query keys.

Dialect mappings encoded here (SURVEY §7): Spark ``split`` ↔ DuckDB
``string_split`` (both 1-indexed via element access), ``datediff(end,
start)`` ↔ ``date_diff('day', start, end)``, Spark int-returning date
parts ↔ DuckDB BIGINT (cast), Spark ``ceil/floor``→LONG ↔ DuckDB
DOUBLE (cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingest_utils_spark.plans.registry import plan
from data_ingest_utils_spark.sources.readers import load_table


@plan(
    "fn_string",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority)                    AS prio_upper,
           lower(o_orderpriority)                    AS prio_lower,
           substr(o_orderpriority, 1, 3)             AS prio3,
           string_split(o_orderpriority, '-')[1]     AS prio_code,
           string_split(o_orderpriority, '-')[2]     AS prio_word,
           CAST(length(o_orderpriority) AS INTEGER)  AS prio_len,
           concat_ws('|', o_orderstatus, o_orderpriority) AS status_prio,
           (o_orderpriority LIKE '%URGENT')          AS is_urgent,
           regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_digit
    FROM orders
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    sp = F.split(F.col("o_orderpriority"), "-")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.lower("o_orderpriority").alias("prio_lower"),
        F.substring("o_orderpriority", 1, 3).alias("prio3"),
        F.element_at(sp, 1).alias("prio_code"),
        F.element_at(sp, 2).alias("prio_word"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.col("o_orderpriority").like("%URGENT").alias("is_urgent"),
        F.regexp_extract("o_orderpriority", "([0-9]+)", 1).alias("prio_digit"),
    )


@plan(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)  AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           date_trunc('month', o_orderdate)    AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since,
           o_orderdate + INTERVAL 3 MONTH      AS plus_3mo,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.expr("datediff(o_orderdate, DATE '1995-01-01')").alias("days_since"),
        F.expr("o_orderdate + INTERVAL 3 MONTH").alias("plus_3mo"),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
    )


@plan(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 2)                     AS price2,
           abs(l_discount - 0.05)                        AS abs_disc,
           CAST(ceil(l_extendedprice) AS BIGINT)         AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT)        AS price_floor,
           round(ln(1 + l_extendedprice), 6)             AS log_price,
           round(pow(l_discount, 2), 6)                  AS disc_sq,
           CAST(sign(l_discount - 0.05) AS INTEGER)      AS disc_sign,
           l_extendedprice / NULLIF(l_quantity, 0)       AS unit_price
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price2"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.log(F.lit(1) + F.col("l_extendedprice")), 6).alias("log_price"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        (F.col("l_extendedprice") / F.nullif(F.col("l_quantity"), F.lit(0))).alias(
            "unit_price"
        ),
    )


@plan(
    "fn_case_when",
    oracle="""
    SELECT o_orderkey,
           CAST(CASE WHEN o_orderpriority LIKE '1-%' THEN 1
                     WHEN o_orderpriority LIKE '2-%' THEN 2
                     WHEN o_orderpriority LIKE '3-%' THEN 3
                     ELSE 9 END AS INTEGER) AS prio_class,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END AS status_word
    FROM orders
    """,
)
def fn_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").like("1-%"), 1)
        .when(F.col("o_orderpriority").like("2-%"), 2)
        .when(F.col("o_orderpriority").like("3-%"), 3)
        .otherwise(9)
        .cast("int")
        .alias("prio_class"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_word"),
    )


@plan(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           embedding[1]::DOUBLE            AS first_elem,
           embedding[64]::DOUBLE           AS last_elem,
           round(list_aggregate(list_transform(embedding[1:8], x -> x::DOUBLE), 'sum'), 6) AS sum8,
           list_contains(list_transform(embedding, x -> x > 0), true) AS has_positive
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops on the embedding column: size, element access, slice
    (+fold), existence — all JVM higher-order functions, no UDF."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.element_at("embedding", 64).cast("double").alias("last_elem"),
        F.round(
            F.aggregate(
                F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sum8"),
        F.exists("embedding", lambda x: x > 0).alias("has_positive"),
    )


@plan(
    "fn_array_explode",
    oracle="""
    SELECT vec_id, CAST(ord - 1 AS INTEGER) AS pos, val::DOUBLE AS val
    FROM (SELECT vec_id,
                 unnest(embedding) AS val,
                 generate_subscripts(embedding, 1) AS ord
          FROM embeddings WHERE vec_id < 10)
    """,
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: vector → (position, value) rows."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))


@plan(
    "fn_map_json",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           count(*) AS n, round(sum(value), 6) AS sum_value
    FROM events GROUP BY k
    """,
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column: parse events.props JSON ({"k": int} —
    shape verified in FIXTURES.md) and aggregate by the extracted key."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.from_json("props", "k INT").getField("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


@plan(
    "fn_struct",
    oracle="""
    SELECT o_orderkey, o_totalprice AS price,
           CAST(year(o_orderdate) AS INTEGER) AS yr
    FROM orders
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a struct, then flatten it back to scalars (the oracle sees
    the flattened projection; struct machinery is Spark-side)."""
    o = load_table(spark, sf_dir, "orders")
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.year("o_orderdate").alias("yr"),
        ).alias("meta"),
    )
    return nested.select("o_orderkey", "meta.price", "meta.yr")


@plan(
    "fn_higher_order",
    oracle="""
    WITH arr AS (
      SELECT l_orderkey, list(l_quantity ORDER BY l_linenumber) AS qtys
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(qtys) AS INTEGER)                             AS n_items,
           round(list_aggregate(list_transform(qtys, x -> x * 2.0),
                                'sum'), 6)                        AS sum_doubled,
           CAST(len(list_filter(qtys, x -> x > 25.0)) AS INTEGER) AS n_large,
           round(list_aggregate(qtys, 'max'), 6)                  AS max_qty
    FROM arr
    """,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over per-order quantity arrays:
    transform (x*2), filter (>25), aggregate (fold sum), array_max —
    all JVM lambda expressions inside whole-stage codegen, the
    idiomatic replacement for per-row Python loops.  The array is
    built with a deterministic ORDER BY inside the aggregation so both
    engines fold identical sequences."""
    li = load_table(spark, sf_dir, "lineitem")
    arr = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_quantity"))
        ).alias("_s")
    ).select(
        "l_orderkey",
        F.transform(F.col("_s"), lambda s: s["l_quantity"]).alias("qtys"),
    )
    return arr.select(
        "l_orderkey",
        F.size("qtys").alias("n_items"),
        F.round(
            F.aggregate(
                F.transform("qtys", lambda x: x * 2.0),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sum_doubled"),
        F.size(F.filter("qtys", lambda x: x > 25.0)).alias("n_large"),
        F.round(F.array_max("qtys"), 6).alias("max_qty"),
    )


@plan(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract(props, '$.missing') AS INTEGER) AS missing
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType for semi-structured data: parse_json into a
    variant, path-extract typed values (try_variant_get -> NULL on
    absent paths).  Variant keeps the parsed binary form columnar —
    at 100 TB it replaces per-query JSON string re-parsing.  For dirty
    feeds swap parse_json -> try_parse_json (malformed -> NULL row
    instead of a failed job; verified)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.try_variant_get(v, "$.missing", "int").alias("missing"),
    )


@plan(
    "fn_hash",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256,
           sha256(concat_ws('|', p_name, p_brand)) AS composite_sha
    FROM part
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash functions (md5 / sha-256) plus a composite
    row hash over concat_ws — the stable-row-fingerprint primitive
    behind ing_add_audit_cols and llm_dedup_exact.  Pure JVM-side
    codegen'd expressions: one narrow scan, no shuffle, and the hex
    encodings agree across engines byte-for-byte."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_name", 256).alias("name_sha256"),
        F.sha2(F.concat_ws("|", "p_name", "p_brand"), 256).alias("composite_sha"),
    )


@plan(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS lo_byte,
           event_id | 4096 AS set_bit,
           xor(event_id, user_id) AS xored,
           user_id << 3 AS shl,
           event_id >> 4 AS shr,
           CAST(bit_count(event_id) AS INTEGER) AS popcount
    FROM events
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (and/or/xor, shifts, popcount) on the
    int64 key columns — the building blocks for bit-packed feature
    flags, bloom-filter addressing, and hash mixing.  All narrow
    codegen'd expressions; DuckDB's TINYINT bit_count is cast up to
    Spark's INTEGER on the oracle side."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("event_id & 255").alias("lo_byte"),
        F.expr("event_id | 4096").alias("set_bit"),
        F.expr("event_id ^ user_id").alias("xored"),
        F.shiftleft(F.col("user_id"), 3).alias("shl"),
        F.shiftright(F.col("event_id"), 4).alias("shr"),
        F.bit_count(F.col("event_id")).alias("popcount"),
    )


@plan(
    "fn_format",
    oracle="""
    SELECT p_partkey,
           printf('%s#%04d', p_brand, p_size) AS brand_code,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           rpad(p_brand, 12, '.') AS padded_brand,
           repeat('*', p_size % 5) AS stars,
           reverse(p_name) AS rev_name
    FROM part
    """,
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting surface: C-style format (format_string /
    printf), pad, repeat, reverse.  Integer/string conversions only —
    float printf rounding modes differ across engines, so numeric
    rendering goes through explicit round+cast instead (SURVEY §7
    float rule).  All codegen'd JVM expressions, one narrow scan."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.format_string("%s#%04d", F.col("p_brand"), F.col("p_size")).alias(
            "brand_code"
        ),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.rpad("p_brand", 12, ".").alias("padded_brand"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
        F.reverse("p_name").alias("rev_name"),
    )


@plan(
    "fn_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           coalesce(array_to_string(regexp_extract_all(p_name, '[a-z]*o[a-z]*'),
                                    ','), '') AS o_words,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CAST(len(regexp_extract_all(p_name, 'a')) AS INTEGER) AS a_count,
           regexp_matches(p_name, 'o.*o') AS double_o
    FROM part
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: extract / extract_all / replace / count / rlike.
    Dialect notes: DuckDB regexp_replace is first-match unless the 'g'
    flag is passed (Spark is always global); DuckDB has no regexp_count
    (len(extract_all) instead, HUGEINT→INTEGER cast); arrays are
    stringified per the registry rule.  All JVM codegen'd — no UDF."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.array_join(
            F.regexp_extract_all("p_name", F.lit("[a-z]*o[a-z]*"), 0), ","
        ).alias("o_words"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.regexp_count("p_name", F.lit("a")).alias("a_count"),
        F.col("p_name").rlike("o.*o").alias("double_o"),
    )


@plan(
    "fn_url",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.Example.COM/docs/' || doc_id
               || '?lang=' || lang || '&v=2#sec' AS url
      FROM documents
    )
    SELECT doc_id,
           lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           regexp_extract(url, '#(.*)$', 1) AS fragment
    FROM urls
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing via Spark's parse_url (HOST/PATH/QUERY-key/REF)
    with lowercased host — the canonicalization step every web-corpus
    pipeline needs.  URLs are built deterministically from the
    documents table; DuckDB has no parse_url, so the oracle uses
    equivalent RFC-3986-ish regexes."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".Example.COM/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        F.lit("&v=2#sec"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
    )


@plan(
    "fn_null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           nullif(l_returnflag, 'N') AS flag_or_null,
           coalesce(nullif(l_returnflag, 'N'), l_linestatus, '?') AS first_set,
           CASE WHEN nullif(l_returnflag, 'N') IS NOT NULL
                THEN 'returned' ELSE 'kept' END AS nvl2_label,
           nullif(l_returnflag, 'N') IS NULL AS is_n
    FROM lineitem
    """,
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL combinators: nullif / coalesce / nvl2 / isNull.  Spark's
    nvl2 has no DuckDB twin, so the oracle spells it as CASE — same
    three-valued logic.  Nulls are synthesized with nullif since the
    fixtures are null-free."""
    li = load_table(spark, sf_dir, "lineitem")
    flag = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        flag.alias("flag_or_null"),
        F.coalesce(flag, F.col("l_linestatus"), F.lit("?")).alias("first_set"),
        F.nvl2(flag, F.lit("returned"), F.lit("kept")).alias("nvl2_label"),
        flag.isNull().alias("is_n"),
    )


@plan(
    "fn_edit_distance",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_brand, left(p_type, 8)) AS lev,
           CASE WHEN levenshtein(p_brand, p_name) > 10 THEN -1
                ELSE levenshtein(p_brand, p_name) END AS lev_capped
    FROM part
    """,
)
def fn_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise Levenshtein distance, plus Spark's thresholded form
    (levenshtein(l, r, k) short-circuits to -1 past k — the cheap path
    for fuzzy-match filters at scale; DuckDB spells the cap as CASE)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.levenshtein("p_brand", F.substring("p_type", 1, 8)).alias("lev"),
        F.levenshtein("p_brand", "p_name", 10).alias("lev_capped"),
    )


@plan(
    "fn_epoch",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           TIMESTAMP '1970-01-01 00:00:00'
             + CAST(floor(epoch(ts)) AS BIGINT) * INTERVAL '1 second' AS ts_roundtrip,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS epoch_days,
           CAST(hour(ts) * 60 + minute(ts) AS INTEGER) AS minute_of_day
    FROM events
    """,
)
def fn_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch/timestamp conversions on TIMESTAMP_NTZ: seconds-since-
    epoch (timestampdiff — tz-independent, unlike unix_timestamp which
    shifts by session tz), the inverse via timestampadd, days-since-
    epoch (unix_date), and minute-of-day.  DuckDB spells the inverse as
    epoch × INTERVAL because to_timestamp() returns TIMESTAMPTZ."""
    from data_ingest_utils_spark.streaming.transforms import EPOCH_SECONDS

    ev = load_table(spark, sf_dir, "events")
    # floor-exact shared template: the oracle floors epoch(ts), and
    # plain timestampdiff(SECOND,...) would truncate toward zero —
    # off by one second for pre-epoch fractional timestamps
    sec_expr = EPOCH_SECONDS.format(col="ts")
    return ev.select(
        "event_id",
        F.expr(sec_expr).alias("epoch_s"),
        F.expr(
            f"timestampadd(SECOND, {sec_expr},"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("ts_roundtrip"),
        F.unix_date(F.to_date("ts")).alias("epoch_days"),
        (F.hour("ts") * 60 + F.minute("ts")).alias("minute_of_day"),
    )


@plan(
    "fn_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_discount), 6) AS sin_d,
           round(cos(l_discount), 6) AS cos_d,
           round(atan(l_discount), 6) AS atan_d,
           round(atan2(l_discount, 0.05), 6) AS atan2_d,
           round(degrees(l_discount), 6) AS deg,
           round(sqrt(l_quantity), 6) AS sqrt_q
    FROM lineitem
    """,
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / transcendental surface.  JVM and DuckDB libm
    agree to well under 1e-6 on [0, 0.1]-range inputs, so ROUND(…,6)
    pins the hash on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_discount"), 6).alias("sin_d"),
        F.round(F.cos("l_discount"), 6).alias("cos_d"),
        F.round(F.atan("l_discount"), 6).alias("atan_d"),
        F.round(F.atan2(F.col("l_discount"), F.lit(0.05)), 6).alias("atan2_d"),
        F.round(F.degrees("l_discount"), 6).alias("deg"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_q"),
    )


@plan(
    "fn_greatest_least",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           greatest(l_tax, l_discount, 0.02) AS g,
           least(l_tax, l_discount, 0.02) AS l,
           greatest(nullif(l_tax, 0), l_discount) AS g_nullskip
    FROM lineitem
    """,
)
def fn_greatest_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    """greatest/least across columns, including the NULL-skipping rule
    both engines share (NULL args are ignored; result is NULL only if
    ALL args are NULL) — checked via a synthesized NULL."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest("l_tax", "l_discount", F.lit(0.02)).alias("g"),
        F.least("l_tax", "l_discount", F.lit(0.02)).alias("l"),
        F.greatest(
            F.nullif(F.col("l_tax"), F.lit(0.0)), F.col("l_discount")
        ).alias("g_nullskip"),
    )


@plan(
    "fn_arrays_zip",
    oracle="""
    SELECT vec_id,
           CAST(unnest(range(1, len(embedding) + 1)) AS INTEGER) AS pos,
           unnest(embedding)::DOUBLE AS fwd,
           unnest(list_reverse(embedding))::DOUBLE AS rev
    FROM embeddings WHERE vec_id < 10
    """,
)
def fn_arrays_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrays_zip + posexplode: two aligned arrays unrolled to
    (pos, a, b) rows — the lockstep-iteration primitive.  DuckDB zips
    positionally via parallel unnest (Postgres-style); positions are
    1-based on both sides."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    zipped = F.arrays_zip(
        F.col("embedding").alias("fwd"), F.reverse("embedding").alias("rev")
    )
    return (
        e.select("vec_id", F.posexplode(zipped))
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("int").alias("pos"),
            F.col("col.fwd").cast("double").alias("fwd"),
            F.col("col.rev").cast("double").alias("rev"),
        )
    )


@plan(
    "fn_base64_hex",
    oracle="""
    SELECT p_partkey,
           base64(p_name::BLOB) AS name_b64,
           (from_base64(base64(p_name::BLOB)))::VARCHAR AS name_roundtrip,
           to_hex(p_partkey) AS key_hex,
           to_hex(p_size) AS size_hex
    FROM part
    """,
)
def fn_base64_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary text codecs: base64 encode/decode round trip and integer
    hex rendering.  Spark hex(BIGINT) and DuckDB to_hex agree exactly
    (uppercase, no zero padding); base64 is RFC 4648 on both."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.base64(F.col("p_name").cast("binary")).alias("name_b64"),
        F.unbase64(F.base64(F.col("p_name").cast("binary")))
        .cast("string")
        .alias("name_roundtrip"),
        F.hex(F.col("p_partkey")).alias("key_hex"),
        F.hex(F.col("p_size")).alias("size_hex"),
    )


@plan(
    "fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / (l_linenumber % 3), 6) AS safe_div,
           CASE WHEN l_orderkey % 1000 = 0 THEN NULL
                ELSE CAST(9223372036854775807 AS BIGINT) END AS safe_add,
           TRY_CAST(l_returnflag AS DOUBLE) AS flag_num,
           [l_returnflag, l_linestatus][l_linenumber] AS flag_at
    FROM lineitem
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: try_divide / try_add / try_cast /
    try_element_at return NULL instead of raising on div-by-zero,
    BIGINT overflow, bad casts, and out-of-bounds access.  At 100 TB
    this is the difference between one poisoned row killing a stage
    (ANSI mode throws) and a NULL you can quarantine downstream —
    the dirty-data posture every large ingest needs.  All four stay
    inside whole-stage codegen; no UDF fallback.

    Cost model (measured round 8 at sf0.1): a try_* MISS is not free —
    each caught overflow surfaces as a JVM exception whose
    error-class message build costs ~20 µs, so try_add overflowing on
    57% of 600 k rows took 7.3 s while the non-overflowing try_*
    columns each ran in ~0.3 s.  try_* is built for RARE poisoned
    rows (here: overflow on the 0.1% ``l_orderkey % 1000 = 0`` slice
    — ~1.5 s total); if bad values are the COMMON case, pre-guard
    with ``when()`` instead of catching per row."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") % 3), 6
        ).alias("safe_div"),
        F.try_add(
            F.lit(9223372036854775807),
            F.when(F.col("l_orderkey") % 1000 == 0, F.lit(1)).otherwise(F.lit(0)),
        ).alias("safe_add"),
        F.try_to_number(F.col("l_returnflag"), F.lit("9.9"))
        .cast("double")
        .alias("flag_num"),
        F.try_element_at(
            F.array("l_returnflag", "l_linestatus"), F.col("l_linenumber")
        ).alias("flag_at"),
    )


@plan(
    "fn_xpath",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus   AS xml_status,
           o_orderpriority AS xml_priority,
           CAST(2 AS INTEGER) AS n_children
    FROM orders
    """,
)
def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML field extraction: render a row as XML, pull fields back out
    with xpath().  The xpath functions are JVM-side (no Python round
    trip); the oracle checks extraction is lossless against the source
    columns.  For feed ingestion (sitemaps, RSS, legacy SOAP) this is
    the scan path.  Perf notes: each xpath call parses the document,
    so ONE xpath('o/*/text()') + element_at beats three separate
    xpath_string calls 3× (the document parse dominates) — measured in
    the sf0.1 sweep; and at ~45 µs per parse the 150 k-row sf0.1 table
    is CPU-bound, so the parallelism guard (a no-op on well-split
    100 TB scans) spreads a single-file source across the pool
    (measured round 8: ~7 s single-partition → sub-second)."""
    from data_ingest_utils_spark.operators.relational import ensure_parallelism

    o = ensure_parallelism(load_table(spark, sf_dir, "orders"), "o_orderkey")
    xml = F.concat(
        F.lit("<o><s>"),
        F.col("o_orderstatus"),
        F.lit("</s><p>"),
        F.col("o_orderpriority"),
        F.lit("</p></o>"),
    )
    parsed = o.select(
        "o_orderkey", F.xpath(xml, F.lit("o/*/text()")).alias("parts")
    )
    return parsed.select(
        "o_orderkey",
        F.element_at("parts", 1).alias("xml_status"),
        F.element_at("parts", 2).alias("xml_priority"),
        F.size("parts").alias("n_children"),
    )


@plan(
    "fn_inline",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'base' AS kind,
           round(l_extendedprice, 6) AS amount
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discounted' AS kind,
           round(l_extendedprice * (1 - l_discount), 6) AS amount
    FROM lineitem
    """,
)
def fn_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline() explodes an inline-built array<struct> into rows —
    the wide-to-long pivot for computed measures.  One narrow scan
    (generator runs inside the same stage, no shuffle, no join);
    the oracle is the equivalent UNION ALL which would scan twice."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = F.array(
        F.struct(
            F.lit("base").alias("kind"),
            F.round(F.col("l_extendedprice"), 6).alias("amount"),
        ),
        F.struct(
            F.lit("discounted").alias("kind"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "amount"
            ),
        ),
    )
    return li.select(
        "l_orderkey", "l_linenumber", F.inline(pairs)
    ).select("l_orderkey", "l_linenumber", "kind", "amount")


@plan(
    "fn_aes_roundtrip",
    oracle="""
    SELECT p_partkey,
           p_name AS name_roundtrip,
           CAST(16 * (length(p_name) // 16 + 1) AS INTEGER) AS cipher_len,
           true AS cipher_differs
    FROM part
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption: aes_encrypt/aes_decrypt round trip
    (AES-128-ECB so the ciphertext is deterministic — the oracle pins
    the exact PKCS#7-padded length; production would use the default
    GCM whose random IV breaks value-hash determinism, not security).
    Both directions are JVM intrinsics — encrypt-at-rest for PII
    columns without a UDF or a separate pass.  The key would come from
    a KMS; a literal stands in here."""
    part = load_table(spark, sf_dir, "part")
    cipher = F.expr("aes_encrypt(p_name, '0123456789abcdef', 'ECB')")
    return part.select(
        "p_partkey",
        F.expr(
            "cast(aes_decrypt(aes_encrypt(p_name, '0123456789abcdef', 'ECB'),"
            " '0123456789abcdef', 'ECB') as string)"
        ).alias("name_roundtrip"),
        F.length(cipher).alias("cipher_len"),
        (F.base64(cipher) != F.col("p_name")).alias("cipher_differs"),
    )


@plan(
    "fn_mask_pii",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
             '[0-9]', 'n', 'g') AS name_masked,
           regexp_replace(c_name, '[0-9]', '*', 'g') AS name_digits_starred
    FROM customer
    """,
)
def fn_mask_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape-preserving PII masking with mask(): letters→X/x,
    digits→n, punctuation kept — downstream format validation still
    passes while the value is unreadable.  Complements fn_aes_roundtrip
    (reversible, keyed) and llm_pii_redact (pattern removal): masking
    is the irreversible display-safe tier.  JVM intrinsic, codegen."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("name_masked"),
        F.expr("mask(c_name, NULL, NULL, '*')").alias("name_digits_starred"),
    )
