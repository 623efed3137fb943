"""Filter expression + randfilter semantics (FIXTURES.md F4)."""

from __future__ import annotations

from tailsql_spark.operators.rowfilter import apply_filter, rewrite_randfilter


def test_rewrite_randfilter():
    out = rewrite_randfilter("randfilter(0.5)")
    assert "rand() < (0.5)" in out and "ELSE false" in out
    assert rewrite_randfilter("time > 10") == "time > 10"


def test_filter_where_syntax(spark):
    df = spark.createDataFrame(
        [(605, "SUCC"), (12500, "SUCC"), (20000, "FAIL")], ["time", "status"]
    )
    # the reference's qlbridge syntax: == works in Spark SQL too
    out = apply_filter(df, 'time > 10000 AND status == "SUCC"').collect()
    assert [(r.time, r.status) for r in out] == [(12500, "SUCC")]


def test_filter_null_drops_row(spark):
    """Expression evaluating to NULL drops the row (squeryer.go:152-161)."""
    df = spark.createDataFrame([(1, None), (2, 5)], "a long, b long")
    out = apply_filter(df, "b > 0").collect()
    assert [r.a for r in out] == [2]


def test_randfilter_bad_rate_drops_everything(spark):
    df = spark.range(1000)
    assert apply_filter(df, "randfilter(0)").count() == 0
    assert apply_filter(df, "randfilter(1)").count() == 0
    assert apply_filter(df, "randfilter(1.5)").count() == 0


def test_randfilter_statistical_band(spark):
    n = apply_filter(spark.range(10000), "randfilter(0.5)").count()
    assert 4200 <= n <= 5800


def test_filter_none_passthrough(spark):
    df = spark.range(10)
    assert apply_filter(df, None) is df
    assert apply_filter(df, "") is df
