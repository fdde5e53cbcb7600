"""Spark operators: index build, query processing, dedup, similarity."""
