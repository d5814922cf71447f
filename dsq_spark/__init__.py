"""dsq_spark — a PySpark-native analytics engine with the capabilities of
multiprocessio/dsq (reference: /root/reference, see SURVEY.md).

Layout:
    session    — SparkSession construction tuned for local + cluster scale
    plans      — SQLite-dialect → Spark SQL rewriting ({N} tables, REGEXP, ->)
    functions  — extended scalar/agg function registration (url_*, date_*, ...)
    sources    — file-format readers (CSV/TSV/JSON/.../logfmt) → DataFrame
    operators  — large-scale pipeline operators (dedup, similarity, text, ...)
    streaming  — Structured Streaming extensions
    queries    — the benchmark/correctness query suite + DuckDB oracles
"""

__version__ = "0.1.0"
