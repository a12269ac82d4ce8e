"""Named query registry: each entry pairs a Spark DataFrame plan with the
ANSI-SQL oracle DuckDB runs on the same parquet tables."""
