"""Composite DataFrame->DataFrame operators. Each is a pure function so the
DuckDB-oracle harness can target it in isolation."""
