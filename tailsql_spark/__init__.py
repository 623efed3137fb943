"""tailsql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``tailsql`` log-stream SQL tool.

The reference tool (see /root/reference, Go) tails log files, parses each
line into a typed row via a regex DSL, filters/throttles the stream,
collects tumbling/sliding windows, materializes each window as SQL tables
``t0..tN`` inside an embedded engine, and runs one SQL query per window.

This package re-expresses that dataflow Spark-first:

* schema/DSL layer  — :mod:`tailsql_spark.dsl` compiles the
  ``(?P<name__type>...)`` regex DSL to a Spark ``StructType`` plus
  JVM-side extraction/cast expressions (no Python UDFs on the hot path).
* relational layer  — the entire delegated SQL surface (joins, aggs,
  window functions, set ops, scalar functions) is Spark SQL / Catalyst;
  :mod:`tailsql_spark.plans.queries` declares the certified inventory.
* streaming layer   — :mod:`tailsql_spark.streaming` implements the
  source → parse → filter → window → per-window-SQL → sink pipeline on
  Structured Streaming with a ``foreachBatch`` recompute harness.
* scale extensions  — :mod:`tailsql_spark.operators` adds the
  large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) designed for 100 TB.
"""

from tailsql_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
