"""Spark-side operators: extraction, dedup, lineage, training-data ops."""
