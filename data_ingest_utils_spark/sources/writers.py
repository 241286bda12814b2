"""Sinks: partitioned parquet writes.

100 TB notes: ``partitionBy`` on a low-cardinality column (here
mktsegment / lang) produces a layout that static + dynamic partition
pruning can exploit on read.  Repartitioning on the partition columns
first avoids the ``tasks × values`` small-files explosion — but it
also funnels each value through ONE task, so for hot values at scale
use ``files_per_partition > 1`` to spread every value over N tasks /
N files via a deterministic content salt.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    mode: str = "overwrite",
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` to parquet partitioned by ``cols``.

    Repartitions by the partition columns first to avoid the
    small-files explosion (each shuffle partition then holds whole
    partition values).  ``files_per_partition=1`` (default) gives one
    file per value — right for small/medium dims; it also means one
    TASK per value, a straggler when one value dominates.  At scale
    set ``files_per_partition=N``: rows additionally shuffle on a
    deterministic salt (xxhash64 of the full row, mod N), so each hot
    value spreads over N tasks and lands as N files.
    """
    if files_per_partition > 1:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        part = df.repartition(*[F.col(c) for c in cols], salt)
    else:
        part = df.repartition(*cols)
    part.write.mode(mode).partitionBy(*cols).parquet(path)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset back (partition columns from paths)."""
    return spark.read.parquet(path)


def zorder16(qx, qy):
    """32-bit Morton/Z-value of two 16-bit quantized coordinates: bit
    ``i`` of ``qx`` lands at position ``2i``, of ``qy`` at ``2i+1`` —
    the classic space-filling-curve interleave (public technique;
    Morton 1966, used by every lakehouse OPTIMIZE ZORDER).  Pure
    integer shifts/ORs, so any engine reproduces it bit-for-bit."""
    return zorder16_nd(qx, qy)


def zorder16_nd(*qs):
    """``16*D``-bit Morton/Z-value of ``D`` 16-bit quantized
    coordinates (round 16, VERDICT r15 #7): bit ``i`` of dimension
    ``d`` lands at position ``D*i + d`` — the N-dim generalization of
    the classic interleave; for ``D == 2`` it reproduces
    :func:`zorder16` bit-for-bit (pinned in tests), so the certified
    2-col layouts are unchanged.  ``D`` is capped at 4 (64-bit z) —
    beyond ~4 dims a Z-curve's per-file span bound degrades toward
    1/n_files^(1/D) of each domain and a Hilbert curve or plain
    column stats serve better; fail loudly rather than cluster badly."""
    d = len(qs)
    if not 1 <= d <= 4:
        raise ValueError(f"zorder16_nd takes 1..4 coordinates, got {d}")
    z = F.lit(0).cast("long")
    for i in range(16):
        for j, q in enumerate(qs):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), d * i + j)
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    *cluster_cols: str,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files CLUSTERED on the
    Z-curve of ``cluster_cols`` (2–4 columns; round 16 generalized
    from the fixed 2-col form — existing positional callers are
    unchanged and produce bit-identical layouts) — the
    multi-dimensional layout tool: a 1-D sort prunes scans on the
    sort column only, while Z-order clustering bounds EVERY file's
    min/max span on ALL ``D`` clustering columns to roughly
    ``1/n_files^(1/D)`` of each domain, so parquet row-group/file
    skipping works for predicates on any clustering column or any
    combination (verified by footer-span assertions in
    tests/test_invariants.py for D=2 and D=3).

    Coordinates are min/max-quantized to 16 bits in-plan (one tiny
    global agg, broadcast back — no driver collect), then
    ``repartitionByRange`` on the z-value gives contiguous curve
    segments per file and ``sortWithinPartitions`` tightens row-group
    stats inside each file.  At 100 TB this is the OPTIMIZE-ZORDER
    compaction shape: one range shuffle, no driver bottleneck, and
    the z computation is ``32·D`` integer ops/row inside codegen."""
    if not 2 <= len(cluster_cols) <= 4:
        raise ValueError(
            f"zorder_write clusters on 2..4 columns, got {cluster_cols!r}"
        )
    from pyspark.sql import types as T

    def _is_nanable(c: str) -> bool:
        return isinstance(df.schema[c].dataType, (T.FloatType, T.DoubleType))

    def _clean(c: str):
        # NaN must not poison the domain bounds (code-review r16,
        # live-reproduced): Spark's min/max order NaN LARGEST, so one
        # NaN row would make span = NaN and floor(x/NaN) quantize
        # EVERY row — not just the NaN one — to bucket 0, silently
        # collapsing the whole dimension.  Exclude NaN from the
        # bounds; the per-value guard in quant() then routes NaN rows
        # themselves to a NULL z (nulls-first placement, same as NULL
        # keys).  Decimals have no NaN; integrals can't hit this.
        return (
            F.when(~F.isnan(F.col(c)), F.col(c)) if _is_nanable(c)
            else F.col(c)
        )

    bounds = F.broadcast(
        df.agg(
            *[
                a
                for i, c in enumerate(cluster_cols)
                for a in (
                    F.min(_clean(c)).alias(f"_min{i}"),
                    F.max(_clean(c)).alias(f"_max{i}"),
                )
            ]
        )
    )

    def quant(c, lo, hi):
        # Span formula branches on the clustering column's type
        # (ADVICE r14: the unconditional ``hi - lo + 1`` is the
        # integer-domain form — it makes the 65536 buckets uniform
        # over the hi-lo+1 distinct integers with max landing in
        # bucket 65535.  Applied to a float/double/decimal column the
        # +1 skews every bucket boundary by 1/(hi-lo+1) of the
        # domain).  Fractional columns use the true span hi-lo with
        # the max value clamped into the top bucket, and a constant
        # column (span 0) degenerates to bucket 0 instead of a
        # divide-by-zero NaN→null z-value.
        from pyspark.sql import types as T

        scaled = (F.col(c) - F.col(lo)).cast("double") * F.lit(65536.0)
        if isinstance(df.schema[c].dataType, T.IntegralType):
            span = (F.col(hi) - F.col(lo) + F.lit(1)).cast("double")
            return F.floor(scaled / span).cast("long")
        span = (F.col(hi) - F.col(lo)).cast("double")
        # NULL (and NaN — code-review r16) clustering values must
        # propagate as NULL in BOTH branches (ADVICE r15: F.least
        # skips NULLs, so a NULL would otherwise land in the top
        # bucket 65535 while the integral branch's floor propagates
        # NULL; a NaN would float through the arithmetic unclamped).
        # NULL/NaN-keyed rows then take the nulls-first range slot
        # instead of silently co-locating with the max-value bucket.
        unkeyed = F.col(c).isNull()
        if _is_nanable(c):
            unkeyed = unkeyed | F.isnan(F.col(c))
        return F.when(unkeyed, F.lit(None).cast("long")).when(
            span == F.lit(0.0), F.lit(0)
        ).otherwise(
            F.least(F.floor(scaled / span), F.lit(65535))
        ).cast("long")

    bound_names = [n for i in range(len(cluster_cols))
                   for n in (f"_min{i}", f"_max{i}")]
    with_z = (
        df.crossJoin(bounds)
        .withColumn(
            "_z",
            zorder16_nd(
                *[
                    quant(c, f"_min{i}", f"_max{i}")
                    for i, c in enumerate(cluster_cols)
                ]
            ),
        )
        .drop(*bound_names)
    )
    (
        with_z.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
