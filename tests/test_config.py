"""Config parsing parity tests (config/config.go:68-160 semantics)."""

from __future__ import annotations

import pytest

from tailsql_spark.config import ThrottleCfg, from_flags, from_yaml

RE = r"(?P<ts__date>\S+) (?P<method__str>\S+) (?P<time__int>\d+)"


def test_from_flags_defaults_and_broadcast():
    cfg = from_flags("select 1", files=["a.log", "b.log"], regexes=[RE], winopt="10:5:-1")
    assert len(cfg.files) == 2
    assert cfg.files[0].regex == RE and cfg.files[1].regex == RE  # single regex broadcasts
    assert cfg.window.size_sec == 10 and cfg.window.slide_sec == 5
    assert cfg.window.ts_field is None
    assert cfg.formatter == "raw"


def test_from_flags_count_mismatch():
    with pytest.raises(ValueError, match="regex count"):
        from_flags("q", files=["a", "b", "c"], regexes=[RE, RE])


def test_from_flags_idx_of_ts_resolution():
    cfg = from_flags("q", files=["a.log"], regexes=[RE], winopt="60:10:0")
    assert cfg.window.ts_field == "ts"
    with pytest.raises(ValueError, match="out of range"):
        from_flags("q", files=["a.log"], regexes=[RE], winopt="60:10:9")


def test_throttle_spec_parse():
    t = ThrottleCfg.parse("100:5:1000")
    assert (t.max_elements, t.period_seconds, t.buffer_size) == (100, 5, 1000)
    with pytest.raises(ValueError):
        ThrottleCfg.parse("100:5")


def test_window_spec_validation():
    with pytest.raises(ValueError):
        from_flags("q", files=["a"], regexes=[RE], winopt="0:0:-1")  # SIZE > 0
    with pytest.raises(ValueError):
        from_flags("q", files=["a"], regexes=[RE], winopt="10:20:-1")  # SLIDE <= SIZE


def test_from_yaml_full_schema(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text(
        f"""
files:
  - path: "/tmp/a.log"
    regex: '{RE}'
    filter: "time > 10"
    throttle:
      max_elements_in_period: 50
      period_seconds: 5
      buffer_size: 100
    do_not_tail: true
window:
  size_seconds: 30
  sliding_interval_seconds: 10
  idx_of_ts_field: 0
sink:
  to: "stdout"
  formatter: "table"
db_engine: "duckdb"
"""
    )
    cfg = from_yaml(str(y), "select 1")
    f = cfg.files[0]
    assert f.path == "/tmp/a.log" and f.filter == "time > 10" and f.do_not_tail
    assert f.throttle.max_elements == 50
    assert cfg.window.size_sec == 30 and cfg.window.ts_field == "ts"
    assert cfg.formatter == "table"  # db_engine accepted & ignored
