"""PySpark-native analytics engine with the query/data-processing surface of
the reference MVP mini-ETL pipeline (see SURVEY.md), re-expressed Spark-first
and extended with LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Layout:
    session.py    SparkSession factory (AQE, UTC, Arrow)
    tables.py     parquet loaders + the canonical ``users`` derivation
    operators/    relational operators (projections, joins, aggs, windows, ...)
    functions/    scalar/array/text column expressions
    sources/      synthetic + HTTP sources, CSV/JSON sinks
    plans/        the ETL pipeline (extract -> transform -> load) + metrics
    streaming/    Structured Streaming flavors of the pipeline
    oracles.py    shared ANSI-SQL fragments for the DuckDB oracle
"""

__version__ = "0.2.0"


def __getattr__(name):
    # Lazy facade: the reference's user-facing surface (load -> run ->
    # export, reference pages/index.js + restart.js) without importing
    # pyspark at package-import time (keeps `import <pkg>` cheap for
    # tooling that only wants __version__).
    _facade = {
        "get_spark": ("session", "get_spark"),
        "run_pipeline": ("plans.pipeline", "run_pipeline"),
        "flagship_metrics_row": ("plans.pipeline", "flagship_metrics_row"),
        "load_users_http": ("sources.http_json", "load_users_http"),
        "synthetic_users": ("sources.synthetic", "synthetic_users"),
        "write_users_csv": ("sources.sinks", "write_users_csv"),
        "write_partitioned": ("sources.sinks", "write_partitioned"),
        "to_json_payload": ("sources.sinks", "to_json_payload"),
        "fallback_metrics": ("sources.static_json", "fallback_metrics"),
        "all_queries": ("registry", "all_queries"),
        "all_oracles": ("registry", "all_oracles"),
    }
    if name in _facade:
        import importlib
        mod, attr = _facade[name]
        return getattr(importlib.import_module(f"{__name__}.{mod}"), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
