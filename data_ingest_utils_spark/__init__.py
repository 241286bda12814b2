"""data_ingest_utils_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capability surface of
``kagesenshi/data_ingest_utils`` (reference checkout empty this round —
see SURVEY.md §0; the operative contract is SURVEY.md §2), extended
with the LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) the task brief mandates.

Design stance (SURVEY.md §7):
- Everything is a composable ``DataFrame -> DataFrame`` function.
- No custom IR, no RDDs, no Catalyst extensions: declare the logical
  plan with the DataFrame/SQL API and let Catalyst + Tungsten + AQE
  pick the physical strategy.
- UDFs only where built-ins genuinely can't express the semantics,
  and then always Arrow-batched (pandas_udf / applyInPandas).
- Batch and streaming share one transform per operator (Structured
  Streaming's unbounded-table model).

Scale stance (the 100 TB design rules every module follows):
- filters/projections stay ``Column`` expressions so Catalyst pushes
  them into the Parquet scan (PushedFilters / ReadSchema);
- dimension joins take explicit ``broadcast()`` hints;
- large-large joins shuffle on their equi-keys and rely on AQE for
  skew splitting and shuffle-partition coalescing;
- no ``collect()`` in any operator hot path (the single exception is
  fetching ONE query vector for similarity search, a O(dim) literal);
- partitioned sinks write layouts that enable partition pruning.
"""

__version__ = "0.1.0"

from data_ingest_utils_spark.session import get_session, ensure_runtime_confs

__all__ = ["get_session", "ensure_runtime_confs", "__version__"]
