"""DuckDB/SQLite → Spark dialect shim (SURVEY §7.3#5 policy: Spark
dialect authoritative; known idioms rewritten for verbatim configs)."""

from __future__ import annotations

from tailsql_spark.plans.dialect import translate_sql


def test_strftime_duckdb_order():
    assert (
        translate_sql("SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') FROM t0")
        == "SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss') FROM t0"
    )


def test_strftime_sqlite_order():
    assert (
        translate_sql("SELECT strftime('%Y-%m', ts) FROM t0")
        == "SELECT date_format(ts, 'yyyy-MM') FROM t0"
    )


def test_epoch_functions():
    assert translate_sql("WHERE epoch(ts) > 5") == "WHERE unix_timestamp(ts) > 5"
    assert translate_sql("WHERE epoch_ms(ts) > 5") == "WHERE unix_millis(ts) > 5"


def test_regexp_matches():
    assert (
        translate_sql("WHERE regexp_matches(msg, 'GET /m')")
        == "WHERE regexp_like(msg, 'GET /m')"
    )


def test_literals_never_rewritten():
    """A match inside a single-quoted literal is user-visible DATA —
    'epoch(x)' must survive verbatim (round-2 advice)."""
    assert translate_sql("SELECT 'epoch(x)' FROM t0") == "SELECT 'epoch(x)' FROM t0"
    assert (
        translate_sql("SELECT 'regexp_matches(a, b)', epoch(ts) FROM t0")
        == "SELECT 'regexp_matches(a, b)', unix_timestamp(ts) FROM t0"
    )
    # '' self-escape keeps the literal span intact
    q = "SELECT 'it''s epoch(x)' FROM t0"
    assert translate_sql(q) == q


def test_strftime_f_directive_per_dialect():
    """%f differs BY DIALECT: DuckDB = microseconds, SQLite =
    fractional seconds including the seconds value (SS.SSS)."""
    assert (
        translate_sql("SELECT strftime(ts, '%H:%M:%f') FROM t0")
        == "SELECT date_format(ts, 'HH:mm:SSSSSS') FROM t0"
    )
    assert (
        translate_sql("SELECT strftime('%H:%M:%f', ts) FROM t0")
        == "SELECT date_format(ts, 'HH:mm:ss.SSS') FROM t0"
    )


def test_spark_sql_passes_through():
    q = "SELECT date_format(ts, 'yyyy'), unix_timestamp(ts), msg RLIKE 'x' FROM t0"
    assert translate_sql(q) == q


def test_shimmed_sql_executes(spark):
    """End-to-end: a verbatim DuckDB-style query runs through the batch
    path against a parsed tailsql table."""
    import tempfile

    from tailsql_spark.streaming.squeryer import SourceSpec, run_batch

    with tempfile.NamedTemporaryFile("w", suffix=".log", delete=False) as fh:
        fh.write("2024-04-12T10:00:00 a\n2024-04-12T11:00:00 b\n")
        path = fh.name
    out = run_batch(
        spark,
        [SourceSpec(path=path, pattern=r"(?P<ts__date>\S+) (?P<msg>\w+)")],
        "select strftime(ts, '%Y-%m-%d %H') as h, count(1) as n "
        "from t0 where regexp_matches(msg, '[ab]') group by h order by h",
    )
    assert out == "h n\n2024-04-12 10 1\n2024-04-12 11 1"


def test_translate_is_idempotent_on_composites():
    """translate(translate(q)) == translate(q): rewritten output must
    never re-match (a second pass over piped/stored SQL is common)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    idioms = st.sampled_from(
        [
            "strftime(ts, '%Y-%m-%d')",
            "strftime('%H:%M:%f', ts)",
            "epoch(ts)",
            "epoch_ms(col_a)",
            "regexp_matches(msg, 'x+')",
            "'epoch(literal)'",
            "unix_timestamp(ts)",
            "count(1)",
        ]
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(idioms, min_size=1, max_size=5))
    def prop(parts):
        q = "SELECT " + ", ".join(parts) + " FROM t0"
        once = translate_sql(q)
        assert translate_sql(once) == once

    prop()
