"""Declarative ingestion pipelines: a list-of-steps spec composes the
operator library into ONE DataFrame transform — the config-driven
surface an ingestion utility exposes to non-Spark users.

A spec is data (JSON/YAML-friendly), e.g.::

    PIPELINE = [
        {"op": "normalize_columns"},
        {"op": "cast_columns", "casts": {"o_totalprice": "double"}},
        {"op": "standardize_nulls"},
        {"op": "filter", "predicate": "o_totalprice > 0"},
        {"op": "select", "columns": ["o_orderkey", "o_totalprice"]},
        {"op": "latest_per_key", "keys": ["o_orderkey"], "ts_col": "o_orderdate"},
    ]
    out = apply_pipeline(df, PIPELINE)

Because every step is a pure DataFrame→DataFrame transform built from
Column expressions, the WHOLE pipeline stays one Catalyst plan:
filters written as step N still push down to the scan, unused columns
are pruned through every step, and AQE re-plans the shuffles — the
spec adds zero execution overhead over hand-written chaining.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingest_utils_spark.operators import ingest as ing

#: op name -> (df, cfg) -> df.  Each entry validates its own config.
_STEP_REGISTRY: dict[str, Callable[[DataFrame, Mapping], DataFrame]] = {
    "normalize_columns": lambda df, cfg: ing.normalize_columns(
        df, trim_strings=cfg.get("trim_strings", True)
    ),
    "cast_columns": lambda df, cfg: ing.cast_columns(
        df, cfg["casts"], safe=cfg.get("safe", True)
    ),
    "standardize_nulls": lambda df, cfg: ing.standardize_nulls(
        df, cols=cfg.get("columns")
    ),
    "with_audit": lambda df, cfg: ing.with_audit(df, load_id=cfg.get("load_id", "")),
    "incremental": lambda df, cfg: ing.incremental(
        df, cfg["ts_col"], F.expr(cfg["last_ts_expr"])
    ),
    "latest_per_key": lambda df, cfg: ing.latest_per_key(
        df, cfg["keys"], cfg["ts_col"], tiebreakers=cfg.get("tiebreakers", ())
    ),
    "filter": lambda df, cfg: df.filter(cfg["predicate"]),
    "select": lambda df, cfg: df.select(*cfg["columns"]),
    "drop": lambda df, cfg: df.drop(*cfg["columns"]),
    "rename": lambda df, cfg: df.withColumnsRenamed(dict(cfg["mapping"])),
    "with_column": lambda df, cfg: df.withColumn(cfg["name"], F.expr(cfg["expr"])),
    "repartition": lambda df, cfg: df.repartition(
        int(cfg["num"]), *cfg.get("by", [])
    )
    if cfg.get("by") or cfg.get("num")
    else df,
}


def step_names() -> Sequence[str]:
    return sorted(_STEP_REGISTRY)


def apply_pipeline(df: DataFrame, spec: Sequence[Mapping]) -> DataFrame:
    """Fold a step-spec list over a DataFrame.  Unknown ops and missing
    config keys fail fast with the step index in the message."""
    out = df
    for i, step in enumerate(spec):
        op = step.get("op")
        if op not in _STEP_REGISTRY:
            raise ValueError(
                f"pipeline step {i}: unknown op {op!r}; known: {', '.join(step_names())}"
            )
        try:
            out = _STEP_REGISTRY[op](out, step)
        except KeyError as e:  # missing required config key
            raise ValueError(
                f"pipeline step {i} ({op}): missing required config key {e}"
            ) from None
    return out
