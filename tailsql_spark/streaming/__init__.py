"""Streaming layer: the source → parse → filter → window → per-window
SQL → sink pipeline (reference: sql/squeryer.go RunAnalysisFromCfg)."""

from tailsql_spark.streaming.squeryer import SourceSpec, StreamQueryer  # noqa: F401
