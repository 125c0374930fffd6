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

__version__ = "0.1.0"
