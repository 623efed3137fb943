"""Dataflow + scale operators for tailsql_spark.

Each module documents the reference operator (file:line in
/root/reference) it re-expresses, or marks itself as a scale extension
beyond the reference surface.
"""
