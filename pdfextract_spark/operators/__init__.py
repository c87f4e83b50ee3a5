"""Spark-side operators: extraction UDFs, dedup, similarity, text analysis."""
