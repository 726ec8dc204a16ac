"""Spark DataFrame operators: extraction UDF, skew-aware repartitioning,
dedup, similarity search."""
