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
    "with_audit": lambda df, cfg: ing.with_audit(
        df,
        load_id=cfg.get("load_id", ""),
        deterministic=cfg.get("deterministic", False),
    ),
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
    "repartition": lambda df, cfg: _repartition(df, cfg),
}

#: required config keys per op — validated BEFORE invoking the step so
#: a KeyError inside an operator is never misread as missing config.
_REQUIRED_KEYS: dict[str, tuple[str, ...]] = {
    "cast_columns": ("casts",),
    "incremental": ("ts_col", "last_ts_expr"),
    "latest_per_key": ("keys", "ts_col"),
    "filter": ("predicate",),
    "select": ("columns",),
    "drop": ("columns",),
    "rename": ("mapping",),
    "with_column": ("name", "expr"),
}

#: list-typed config keys per op — a bare string would be *-splatted
#: into characters (select "doc_id" → select('d','o',…)), the classic
#: JSON/YAML mistake on this non-Spark-user surface; reject it.
_LIST_KEYS: dict[str, tuple[str, ...]] = {
    "select": ("columns",),
    "drop": ("columns",),
    "latest_per_key": ("keys", "tiebreakers"),
    "repartition": ("by",),
    "standardize_nulls": ("columns",),
}


def _repartition(df: DataFrame, cfg: Mapping) -> DataFrame:
    """num and/or by — both optional but not both absent; num=0 is an
    error, not a silent no-op."""
    num, by = cfg.get("num"), cfg.get("by", [])
    if num is None and not by:
        raise ValueError("repartition step needs 'num' and/or 'by'")
    if num is not None:
        if int(num) <= 0:
            raise ValueError(f"repartition step: num must be positive, got {num}")
        return df.repartition(int(num), *by)
    return df.repartition(*by)


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
        missing = [k for k in _REQUIRED_KEYS.get(op, ()) if k not in step]
        if missing:
            raise ValueError(
                f"pipeline step {i} ({op}): missing required config key"
                f" {', '.join(repr(k) for k in missing)}"
            )
        for k in _LIST_KEYS.get(op, ()):
            v = step.get(k)
            if isinstance(v, str):
                raise ValueError(
                    f"pipeline step {i} ({op}): {k!r} must be a LIST of"
                    f" names, got the string {v!r} (a bare string would"
                    " be exploded into characters)"
                )
        out = _STEP_REGISTRY[op](out, step)
    return out
