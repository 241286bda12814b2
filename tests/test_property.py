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


@given(
    lo=st.integers(-1_000_000, 1_000_000),
    width=st.integers(0, 10_000),
    n=st.integers(1, 64),
)
@settings(max_examples=60, deadline=None)
def test_prop_range_partition_predicates_cover_exactly_once(lo, width, n):
    """The JDBC-style range planner's structural contract, checked
    through REAL SQL evaluation (sqlite — the same engine the
    scan_sqlite_partitioned key pulls through): for ARBITRARY bounds
    the per-partition WHERE clauses are exhaustive and mutually
    exclusive over every probe value — boundary integers, values far
    outside [lower, upper), and NULL — so a partitioned pull never
    drops or duplicates a row.  Generalizes the hand-picked cases in
    test_invariants.test_range_partition_predicates_contract, and
    pins the floor-division stride on NEGATIVE bounds (where a
    truncating-division port would zero the stride)."""
    import sqlite3

    from data_ingest_utils_spark.sources.jdbc import range_partition_predicates

    hi = lo + width
    preds = range_partition_predicates("id", lo, hi, n)
    assert 1 <= len(preds) <= max(1, n)
    if preds == [None]:
        return  # single full scan: trivially exhaustive + exclusive

    # probes: all stride boundaries +/-1, bounds, extremes, and NULL
    probes: set[int | None] = {lo - 1, lo, hi - 1, hi, hi + 1,
                               -(10**12), 10**12, None}
    for p in preds:
        for tok in p.replace("(", " ").replace(")", " ").split():
            if tok.lstrip("-").isdigit():
                v = int(tok)
                probes.update((v - 1, v, v + 1))

    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE t (pk INTEGER PRIMARY KEY, id INTEGER)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(sorted(probes, key=repr)))
    )
    matched: list[set[int]] = [
        {pk for (pk,) in con.execute(f"SELECT pk FROM t WHERE {p}")}
        for p in preds
    ]
    con.close()
    all_pks = set(range(len(probes)))
    hit_counts = {pk: sum(pk in m for m in matched) for pk in all_pks}
    assert all(c == 1 for c in hit_counts.values()), {
        "preds": preds,
        "multi_or_missed": {pk: c for pk, c in hit_counts.items() if c != 1},
    }


@given(
    docs=st.lists(
        st.lists(st.sampled_from("aa bb cc dd ee".split()), max_size=8),
        min_size=1,
        max_size=12,
    ),
)
@SETTINGS
def test_prop_minhash_signature_paths_identical(spark, docs):
    """The two MinHash signature paths — text-based
    ``minhash_signatures`` and the round-8 cached-array derivation
    ``_signatures_from_hash_arrays`` ∘ ``_shingle_hash_arrays`` — must
    produce bit-identical signatures for every doc that has shingles
    (the cached path's claim: min over the DISTINCT shingle-hash set
    equals min over the shingle multiset, under the same per-
    permutation re-hash).  Sub-shingle docs are excluded: the
    standalone path falls back to token sets for them while the
    pipeline path drops them before candidates (documented)."""
    from data_ingest_utils_spark.operators.dedup import (
        _shingle_hash_arrays,
        _signatures_from_hash_arrays,
        minhash_signatures,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    num_perm, shingle_n = 8, 3

    via_text = {
        r.doc_id: tuple(r[f"mh{i}"] for i in range(num_perm))
        for r in minhash_signatures(
            df, "text", "doc_id", num_perm, shingle_n
        ).collect()
    }
    hv, _ = _shingle_hash_arrays(
        df.select("doc_id", "text"), shingle_n, "doc_id"
    )
    via_arrays = {
        r.doc_id: tuple(r[f"mh{i}"] for i in range(num_perm))
        for r in _signatures_from_hash_arrays(
            hv, "doc_id", num_perm
        ).collect()
    }
    with_shingles = {i for i, toks in enumerate(docs) if len(toks) >= shingle_n}
    assert set(via_arrays) == with_shingles
    for doc_id in with_shingles:
        assert via_arrays[doc_id] == via_text[doc_id], doc_id


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1,
        max_size=25,
    ),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_prop_connected_components_match_union_find(spark, edges):
    """The distributed min-label-propagation + pointer-jumping
    component finder against an INDEPENDENT reference (pure-Python
    union-find) on random graphs — self-loops, parallel/reversed
    duplicate edges, multiple components, and chains included.  Both
    must produce identical {vertex: min-vertex-of-component} maps;
    this pins the iterative algorithm itself, where the fixture
    oracles only pin one corpus-derived graph shape per run."""
    from data_ingest_utils_spark.operators.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expected = {}
    for v in parent:
        root = find(v)
        expected.setdefault(root, []).append(v)
    want = {
        v: min(members)
        for members in expected.values()
        for v in members
    }

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.v: r.component for r in connected_components(df).collect()
    }
    assert got == want


@given(raw=st.binary(max_size=200))
@settings(max_examples=120, deadline=None)
def test_prop_media_parsers_never_leak_foreign_errors(raw):
    """Decoder dirty-payload contract, fuzzed: for ARBITRARY bytes,
    parse_ppm / parse_wav either return a well-shaped result or raise
    ValueError — never EOFError / struct.error / IndexError, which
    would surface in executors as unclassifiable task failures instead
    of a quarantine-able decode error (wave.open raises bare EOFError
    on truncated chunks — found by this fuzz and folded into the
    contract)."""
    from data_ingest_utils_spark.operators import multimodal as mm

    for fn in (mm.parse_ppm, mm.parse_bmp, mm.parse_image, mm.parse_y4m,
               mm.parse_wav):
        try:
            out = fn(raw)
        except ValueError:
            continue
        assert len(out) == 3


@given(raw=st.binary(max_size=64))
@settings(max_examples=60, deadline=None)
def test_prop_ppm_roundtrip_after_valid_header(raw):
    """Any byte raster round-trips through parse_ppm when wrapped in a
    canonical header (incl. a '#' comment line, which the netpbm spec
    allows anywhere in the header): dims and every pixel byte come
    back exactly."""
    from data_ingest_utils_spark.operators import multimodal as mm

    n_px = len(raw) // 3
    if n_px == 0:
        return
    body = raw[: n_px * 3]
    payload = b"P6\n# fuzz comment\n%d 1\n255\n" % n_px + body
    w, h, px = mm.parse_ppm(payload)
    assert (w, h) == (n_px, 1)
    assert px.tobytes() == body


@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_prop_wav_roundtrip(samples, rate):
    """Any int16 sample sequence round-trips exactly through a
    stdlib-written WAV container and parse_wav — frame count, rate,
    and every sample bit-identical."""
    import io
    import struct
    import wave

    from data_ingest_utils_spark.operators import multimodal as mm

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    n, got_rate, s = mm.parse_wav(buf.getvalue())
    assert (n, got_rate) == (len(samples), rate)
    assert s.tolist() == samples


FUNNEL_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 3),                      # user_id — few users, dense
        st.integers(0, 6),                      # ts — SMALL domain: ties on purpose
        # None included deliberately: NULL event_type exercises the
        # three-valued (NULL == 'view') edge the hv flag must collapse
        # to 0 exactly like the oracle's CASE (code-review r15)
        st.sampled_from(["view", "click", "purchase", "error", None]),
    ),
    max_size=30,
)


@SETTINGS
@given(rows=FUNNEL_EVENTS)
def test_prop_funnel_order_semantics_tie_robust(spark, rows):
    """evt_funnel_steps' sequencing core vs the identical DuckDB SQL on
    RANDOM event sets with deliberate timestamp TIES (ts domain 0-6,
    up to 30 events over 4 users).  The strict-> construction claims
    engine-order independence under ties: the running min either
    already includes a tied prerequisite (equal ts fails >) or not yet
    (NULL fails >) — either tie order, same outcome.  Hypothesis hunts
    the counterexample; a single divergent frame shrinks to minimal."""
    from pyspark.sql import Window

    sdf = spark.createDataFrame(
        [(int(u), int(t), e) for u, t, e in rows],
        "user_id long, ts long, event_type string",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = (
        sdf.withColumn(
            "first_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "qual_click",
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("first_view")),
                F.col("ts"),
            ),
        )
        .withColumn("first_click", F.min("qual_click").over(w))
    )
    got = (
        flagged.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("hv"),
            F.max(F.col("qual_click").isNotNull().cast("int")).alias("hc"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("first_click")),
                    1,
                ).otherwise(0)
            ).alias("hp"),
        )
        .toPandas()
    )
    want = _duck(
        {"ev": pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])},
        """
        WITH s1 AS (
          SELECT user_id, ts, event_type,
                 min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS first_view
          FROM ev
        ),
        s2 AS (
          SELECT *, CASE WHEN event_type = 'click' AND ts > first_view
                         THEN ts END AS qual_click
          FROM s1
        ),
        s3 AS (
          SELECT *, min(qual_click)
                      OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS first_click
          FROM s2
        )
        SELECT user_id,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
               max(CASE WHEN qual_click IS NOT NULL THEN 1 ELSE 0 END) AS hc,
               max(CASE WHEN event_type = 'purchase' AND ts > first_click
                        THEN 1 ELSE 0 END) AS hp
        FROM s3 GROUP BY user_id
        """,
    )
    assert _norm(got) == _norm(want)


@SETTINGS
@given(rows=FUNNEL_EVENTS)
def test_prop_funnel_time_to_convert_percentiles(spark, rows):
    """evt_funnel_time_to_convert's core vs the identical DuckDB SQL
    on random tie-laden event sets: per-user first_view / qualifying
    first_click / qualifying first_purchase, then EXACT interpolated
    percentiles of the integer conversion delays.  Exercises the
    cross-engine percentile contract (Spark ``percentile`` vs DuckDB
    ``quantile_cont`` — same (n−1)·q linear interpolation) on top of
    the strict-> sequencing the funnel fuzz already pins; a
    divergence in either layer shrinks to a minimal frame."""
    from pyspark.sql import Window

    sdf = spark.createDataFrame(
        [(int(u), int(t), e) for u, t, e in rows],
        "user_id long, ts long, event_type string",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = (
        sdf.withColumn(
            "first_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "qual_click",
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("first_view")),
                F.col("ts"),
            ),
        )
        .withColumn("first_click", F.min("qual_click").over(w))
        .withColumn(
            "qual_purchase",
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("first_click")),
                F.col("ts"),
            ),
        )
    )
    per_user = flagged.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min("qual_click").alias("fc"),
        F.min("qual_purchase").alias("fp"),
    )
    got = (
        per_user.select(
            F.expr(
                "stack(2, 'v2c', fc - fv, 'c2p', fp - fc) AS (stage, d)"
            )
        )
        .filter(F.col("d").isNotNull())
        .groupBy("stage")
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("percentile(d, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(d, 0.9)"), 6).alias("p90"),
        )
        .toPandas()
    )
    want = _duck(
        {"ev": pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])},
        """
        WITH s1 AS (
          SELECT user_id, ts, event_type,
                 min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS first_view
          FROM ev
        ),
        s2 AS (
          SELECT *, CASE WHEN event_type = 'click' AND ts > first_view
                         THEN ts END AS qual_click
          FROM s1
        ),
        s3 AS (
          SELECT *, min(qual_click)
                      OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS first_click
          FROM s2
        ),
        s4 AS (
          SELECT *, CASE WHEN event_type = 'purchase' AND ts > first_click
                         THEN ts END AS qual_purchase
          FROM s3
        ),
        u AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
                 min(qual_click) AS fc,
                 min(qual_purchase) AS fp
          FROM s4 GROUP BY user_id
        ),
        d AS (
          SELECT 'v2c' AS stage, fc - fv AS d FROM u WHERE fc IS NOT NULL
          UNION ALL
          SELECT 'c2p', fp - fc FROM u WHERE fp IS NOT NULL
        )
        SELECT stage, count(*)::BIGINT AS n,
               round(quantile_cont(d, 0.5), 6) AS p50,
               round(quantile_cont(d, 0.9), 6) AS p90
        FROM d GROUP BY stage
        """,
    )
    assert _norm(got) == _norm(want)


ASOF_ROWS = st.lists(
    st.tuples(
        st.integers(0, 3),                        # user_id — dense
        st.one_of(st.none(), st.integers(0, 6)),  # ts — ties AND NULLs
        st.sampled_from(["view", "purchase", None]),
    ),
    max_size=30,
)


@SETTINGS
@given(rows=ASOF_ROWS)
def test_prop_asof_attach_cross_engine(spark, rows):
    """as_of_attach (backward) and as_of_attach_forward vs the DuckDB
    last_value/first_value IGNORE NULLS twins on random tie-laden,
    NULL-laden frames.  Pins two semantics the fixture keys never
    exercise: (a) TIES — the event_id tiebreaker makes the window
    order total, so both engines agree on which 'most recent' value a
    tied row sees; (b) NULL timestamps — Spark sorts NULL FIRST in
    ascending window order while DuckDB defaults to NULLS LAST, so
    the twin must say NULLS FIRST explicitly; a NULL-ts purchase is
    then 'before' every real timestamp in both engines (documented
    choice: as-of over a NULL timestamp is engine-order semantics,
    not time semantics — real pipelines should filter null ts)."""
    from data_ingest_utils_spark.operators.relational import (
        as_of_attach,
        as_of_attach_forward,
    )

    data = [(int(u), t, e, i) for i, (u, t, e) in enumerate(rows)]
    sdf = spark.createDataFrame(
        data, "user_id long, ts long, event_type string, event_id long"
    )
    val = F.when(F.col("event_type") == "purchase", F.col("ts"))
    got = (
        as_of_attach_forward(
            as_of_attach(sdf, ["user_id"], "ts", val, "asof_back",
                         tiebreakers=["event_id"]),
            ["user_id"], "ts", val, "asof_fwd", tiebreakers=["event_id"],
        )
        .select("event_id", "asof_back", "asof_fwd")
        .toPandas()
    )
    want = _duck(
        {"ev": pd.DataFrame(
            data, columns=["user_id", "ts", "event_type", "event_id"])},
        """
        SELECT event_id,
               last_value(CASE WHEN event_type = 'purchase' THEN ts END
                          IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY ts NULLS FIRST, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS asof_back,
               first_value(CASE WHEN event_type = 'purchase' THEN ts END
                           IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY ts NULLS FIRST, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS asof_fwd
        FROM ev
        """,
    )
    assert _norm(got) == _norm(want)


RANGE_ROWS = st.lists(
    st.tuples(
        st.integers(0, 2),                        # user — dense partitions
        st.one_of(st.none(), st.integers(0, 9)),  # sort key — ties AND NULLs
        st.one_of(st.none(), st.integers(-5, 5)), # value — avg skips NULLs
    ),
    max_size=30,
)


@SETTINGS
@given(rows=RANGE_ROWS)
def test_prop_range_frame_window_cross_engine(spark, rows):
    """RANGE-frame windows (win_moving_avg_range's class) vs the
    identical DuckDB SQL on random tie-laden, NULL-laden frames.
    Pins three standard-SQL behaviors the fixture key never stresses:
    tied sort keys are PEERS (every peer's row is in every peer's
    frame — order-insensitive by construction), NULL sort keys form
    one shared peer frame in BOTH engines (probed: Spark's nulls-first
    and DuckDB's explicit NULLS FIRST agree), and avg skips NULL
    values.  Values are exact small integers so avg is an exact
    rational — 6-dp rounding can't mask a frame-membership bug."""
    from pyspark.sql import Window

    data = [(int(u), s, v, i) for i, (u, s, v) in enumerate(rows)]
    sdf = spark.createDataFrame(
        data, "u long, sec long, v long, id long"
    )
    w = Window.partitionBy("u").orderBy("sec").rangeBetween(
        -3, Window.currentRow
    )
    got = sdf.select(
        "id",
        F.round(F.avg("v").over(w), 6).alias("mov_avg"),
        F.count("v").over(w).alias("n_vals"),
    ).toPandas()
    want = _duck(
        {"t": pd.DataFrame(data, columns=["u", "sec", "v", "id"])},
        """
        SELECT id,
               round(avg(v) OVER w, 6) AS mov_avg,
               count(v) OVER w AS n_vals
        FROM t
        WINDOW w AS (PARTITION BY u ORDER BY sec NULLS FIRST
                     RANGE BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
    )
    assert _norm(got) == _norm(want)


ISLAND_ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 15)),  # (user, day) w/ dups
    max_size=40,
)


@SETTINGS
@given(rows=ISLAND_ROWS)
def test_prop_gap_islands_histogram(spark, rows):
    """win_gap_islands' core (distinct days → date-minus-row_number
    islands → streak-length histogram) vs the identical DuckDB SQL on
    random duplicate-laden (user, day) sets.  Duplicate days collapse
    before numbering, so the islands are a pure function of the day
    SET — engine sort order can't matter; hypothesis hunts the
    counterexample."""
    from pyspark.sql import Window

    base = "2024-01-01"
    sdf = spark.createDataFrame(
        [(int(u), int(d)) for u, d in rows], "user_id long, off int"
    ).select(
        "user_id",
        F.date_add(F.lit(base).cast("date"), F.col("off")).alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    got = (
        sdf.withColumn("grp", F.date_sub(F.col("d"), F.row_number().over(w)))
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"))
        .groupBy("len")
        .agg(F.count("*").alias("n_streaks"))
        .toPandas()
    )
    want = _duck(
        {"t": pd.DataFrame(rows, columns=["user_id", "off"])},
        f"""
        WITH d AS (
          SELECT DISTINCT user_id, DATE '{base}' + CAST(off AS INT) AS d
          FROM t
        ),
        i AS (
          SELECT user_id, d,
                 d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                          AS INT) AS grp
          FROM d
        ),
        s AS (SELECT user_id, grp, count(*) AS len FROM i GROUP BY 1, 2)
        SELECT len, count(*) AS n_streaks FROM s GROUP BY len
        """,
    )
    assert _norm(got) == _norm(want)
