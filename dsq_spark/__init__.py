"""dsq_spark — a PySpark-native analytics engine with the capabilities of
multiprocessio/dsq (reference: /root/reference, see SURVEY.md).

Layout:
    session    — SparkSession construction tuned for local + cluster scale
    rewrite    — SQLite-dialect → Spark SQL rewriting ({N} tables, REGEXP, ->)
    functions  — extended scalar/agg function registration (url_*, date_*, ...)
    sources    — file-format readers (CSV/TSV/JSON/.../logfmt) → DataFrame
    io_out     — JSON / pretty-table / schema sinks (reference output grammar)
    cache      — content-hash → Parquet ingest cache
    cli        — dsq-compatible command line + REPL
    multimodal — binary media columns via Arrow-batched mapInPandas
    streaming  — Structured Streaming extensions (windows, stateful ops)
    queries    — the benchmark/correctness query suite + DuckDB oracles
               (dedup, similarity, text analysis, TPC-H patterns, multimodal)
"""

__version__ = "0.1.0"
