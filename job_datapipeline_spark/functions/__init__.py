"""Column-expression libraries. Native ``pyspark.sql.functions`` first —
everything stays JVM-side inside whole-stage codegen; Python UDFs are
reserved for the HTML-extraction surface (sources/html.py)."""
