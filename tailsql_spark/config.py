"""Job configuration: YAML schema + CLI-flag parity with the reference.

YAML schema mirrors ``/root/reference/config/config.go:14-49`` field for
field (see ``/root/reference/config.yaml`` for the documented example);
validation rules mirror ``config/config.go:127-208``:

* regex/filter/throttler counts must match the file count (or be
  empty/singular) — ``config.go:142-160``;
* window spec ``SIZE:SLIDE:IDX_OF_TS`` — ``config.go:68-94``;
* throttler spec ``MAX_ELE:PERIOD_SEC:BUFF_SIZE`` — ``config.go:96-125``;
* defaults: formatter ``raw``, sink ``stdout`` — ``config.go:190-199``.

``db_engine`` is accepted for config-file compatibility and ignored:
the engine is always Spark SQL (the reference's per-window embedded
DuckDB/SQLite collapses into Catalyst — SURVEY §1.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml

from tailsql_spark.operators.windows import WindowSpec


@dataclass
class ThrottleCfg:
    max_elements: int = 0  # 0 → no throttle
    period_seconds: int = 0
    buffer_size: int = 0

    @classmethod
    def parse(cls, spec: str) -> "ThrottleCfg":
        parts = [int(p) for p in spec.split(":")]
        if len(parts) != 3:
            raise ValueError(f"throttler spec must be MAX_ELE:PERIOD_SEC:BUFF_SIZE, got {spec!r}")
        return cls(*parts)


@dataclass
class FileCfg:
    path: str
    regex: str
    filter: str | None = None
    throttle: ThrottleCfg = field(default_factory=ThrottleCfg)
    do_not_tail: bool = False


@dataclass
class JobCfg:
    files: list[FileCfg]
    window: WindowSpec
    sql: str
    formatter: str = "raw"
    sink_to: str = "stdout"
    log_level: str = "info"

    def validate(self) -> "JobCfg":
        if not self.files:
            raise ValueError("at least one file to follow is required")
        for f in self.files:
            if not f.regex:
                raise ValueError(f"file {f.path}: regex is required")
        if self.formatter not in ("raw", "rawv", "table"):
            raise ValueError(f"unknown formatter {self.formatter!r}")
        if self.sink_to not in ("stdout",):
            raise ValueError(f"unknown sink {self.sink_to!r}")
        return self


def _resolve_ts_field(idx: int, first_regex: str) -> str | None:
    """Resolve the reference's IDX_OF_TS column index against the first
    source's parsed schema (event-time windows; -1 → processing time)."""
    if idx < 0:
        return None
    from tailsql_spark.dsl import compile_pattern

    fields = compile_pattern(first_regex).fields
    if idx >= len(fields):
        raise ValueError(f"IDX_OF_TS {idx} out of range for {[f.name for f in fields]}")
    return fields[idx].name


def _broadcast(values: list, n: int, what: str) -> list:
    """Reference rule: per-file lists must match the file count; a
    single value broadcasts; empty means none (config.go:142-160)."""
    if not values:
        return [None] * n
    if len(values) == 1:
        return values * n
    if len(values) != n:
        raise ValueError(f"{what} count {len(values)} != file count {n}")
    return values


def from_yaml(path: str, sql: str) -> JobCfg:
    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}
    files = [
        FileCfg(
            path=f.get("path", "/dev/stdin"),
            regex=f.get("regex", ""),
            filter=f.get("filter") or None,
            throttle=ThrottleCfg(
                max_elements=(f.get("throttle") or {}).get("max_elements_in_period", 0),
                period_seconds=(f.get("throttle") or {}).get("period_seconds", 0),
                buffer_size=(f.get("throttle") or {}).get("buffer_size", 0),
            ),
            do_not_tail=bool(f.get("do_not_tail", False)),
        )
        for f in raw.get("files", [])
    ]
    w = raw.get("window") or {}
    window = WindowSpec(
        size_sec=int(w.get("size_seconds", 10)),
        slide_sec=int(w.get("sliding_interval_seconds", 0)),
        ts_field=_resolve_ts_field(
            int(w.get("idx_of_ts_field", -1)), files[0].regex if files else ""
        ),
    )
    sink = raw.get("sink") or {}
    return JobCfg(
        files=files,
        window=window,
        sql=sql,
        formatter=sink.get("formatter") or "raw",
        sink_to=sink.get("to") or "stdout",
        log_level=(raw.get("log") or {}).get("level", "info"),
    ).validate()


def from_flags(
    sql: str,
    files: list[str],
    regexes: list[str],
    filters: list[str] | None = None,
    winopt: str = "10:5:-1",
    throttlers: list[str] | None = None,
    formatter: str = "raw",
    do_not_tail: bool = False,
) -> JobCfg:
    n = len(files)
    regexes = _broadcast(regexes, n, "regex")
    filts = _broadcast(filters or [], n, "filter")
    thr = _broadcast([ThrottleCfg.parse(t) for t in (throttlers or [])], n, "throttler")
    parts = winopt.split(":")
    idx = int(parts[2]) if len(parts) > 2 else -1
    window = WindowSpec(
        size_sec=int(parts[0]),
        slide_sec=int(parts[1]) if len(parts) > 1 else 0,
        ts_field=_resolve_ts_field(idx, regexes[0] or ""),
    )
    return JobCfg(
        files=[
            FileCfg(
                path=p,
                regex=r or "",
                filter=f,
                throttle=t or ThrottleCfg(),
                do_not_tail=do_not_tail,
            )
            for p, r, f, t in zip(files, regexes, filts, thr)
        ],
        window=window,
        sql=sql,
        formatter=formatter,
    ).validate()
