"""`python -m dsq_spark file.csv "SELECT ... FROM {}"` — the dsq-style CLI."""

from dsq_spark.cli import main

main()
