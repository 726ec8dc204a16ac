"""Table sources/sinks: parquet-backed catalog with an Iceberg-shaped API."""
