"""Schema-drift gate: the testdata contract must fail LOUD, not deep.

Round 3 lesson: the driver's ``events.ts`` silently flipped from parquet
TIMESTAMP(NANOS) to microsecond-NTZ and the first symptom was an
``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`` stack trace inside
``withWatermark``. ``check_schema`` pins a coarse type-class per column
so any future flip yields one actionable :class:`SchemaDriftError` at
``load_table`` time instead.
"""

from __future__ import annotations

import os

import pytest

from tailsql_spark.plans.catalog import (
    EXPECTED_COLUMNS,
    SchemaDriftError,
    TABLES,
    check_schema,
    load_table,
)

from conftest import SF_DIR


def test_all_tables_pass_pinned_contract(spark):
    """Every driver table loads clean against EXPECTED_COLUMNS."""
    for name in TABLES:
        load_table(spark, SF_DIR, name)  # raises SchemaDriftError on drift


def test_events_ts_is_ltz_timestamp(spark):
    """The watermark-critical column is LTZ after normalization."""
    from pyspark.sql.types import TimestampType

    df = load_table(spark, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)


def test_every_table_has_a_pin():
    assert set(EXPECTED_COLUMNS) == set(TABLES)


def test_ntz_flip_fails_loud(spark, tmp_path):
    """A deliberate NTZ fixture produces ONE actionable error.

    Simulates exactly the round-3 drift: a timestamp column that
    survives normalization as NTZ (here: constructed directly, as if a
    future physical shape bypassed both defenses).
    """
    df = spark.sql(
        "SELECT 1L AS event_id, TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts, "
        "2L AS user_id, 'click' AS event_type, 1.0D AS value, '{}' AS props"
    )
    with pytest.raises(SchemaDriftError, match=r"`ts` is timestamp_ntz, expected timestamp"):
        check_schema("events", df)


def test_missing_column_fails_loud(spark):
    df = spark.sql("SELECT 1L AS event_id")
    with pytest.raises(SchemaDriftError, match=r"`ts` missing"):
        check_schema("events", df)


def test_raw_long_timestamp_fails_loud(spark, tmp_path):
    """Nanos-as-long surviving un-converted (the other historical shape)."""
    df = spark.sql(
        "SELECT 1L AS event_id, 1704067200000000000L AS ts, 2L AS user_id, "
        "'click' AS event_type, 1.0D AS value, '{}' AS props"
    )
    with pytest.raises(SchemaDriftError, match=r"`ts` is integer, expected timestamp"):
        check_schema("events", df)
