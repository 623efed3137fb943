"""Query inventory: the certified SQL surface + extension operators.

``tailsql_spark.plans.registry`` aggregates every declared query into a
single registry consumed by ``__spark_entry__.py`` (driver contract) and
by the local differential-oracle tests.
"""
