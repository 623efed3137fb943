"""DuckDB/SQLite → Spark SQL dialect shim for verbatim user queries.

The reference delegates user SQL to a pluggable engine
(``db_engine: duckdb | sqlite | qlbridge``, ``/root/reference/
config.yaml``), so existing tailsql configs may contain engine-specific
idioms.  Policy (SURVEY §7.3#5): **Spark dialect is authoritative** —
this shim only rewrites the handful of scalar/date idioms that appear
in real tailsql-style queries and have exact Spark equivalents, so a
verbatim-copied config keeps working:

==========================================  ==============================
source idiom                                Spark rewrite
==========================================  ==============================
``strftime(ts, '%Y-%m-%d')``   (DuckDB)     ``date_format(ts, 'yyyy-MM-dd')``
``strftime('%Y-%m-%d', ts)``   (SQLite)     ``date_format(ts, 'yyyy-MM-dd')``
``epoch(ts)``                  (DuckDB)     ``unix_timestamp(ts)``
``epoch_ms(ts)``               (DuckDB)     ``unix_millis(ts)``
``regexp_matches(s, 'p')``     (DuckDB)     ``regexp_like(s, 'p')``
==========================================  ==============================

Anything else passes through untouched (and fails loudly in Spark's
analyzer if genuinely engine-specific — better than a silent semantic
shift).  The rewrites are pure text transforms on non-nested argument
forms; Spark defines none of the source names, so a false positive
would have been an analyzer error anyway.
"""

from __future__ import annotations

import re

#: C-strftime directive → Spark DateTimeFormatter pattern.
_STRFTIME_DIRECTIVES = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%j": "DDD",
    "%p": "a",
    "%%": "%",
}

_DIRECTIVE_RE = re.compile("|".join(re.escape(k) for k in _STRFTIME_DIRECTIVES))

# strftime(expr, 'fmt')  — DuckDB argument order
_STRFTIME_DUCK = re.compile(
    r"strftime\(\s*([^(),']+?)\s*,\s*'([^']*)'\s*\)", re.IGNORECASE
)
# strftime('fmt', expr)  — SQLite argument order
_STRFTIME_SQLITE = re.compile(
    r"strftime\(\s*'([^']*)'\s*,\s*([^(),']+?)\s*\)", re.IGNORECASE
)
_EPOCH_MS = re.compile(r"\bepoch_ms\s*\(", re.IGNORECASE)
_EPOCH = re.compile(r"\bepoch\s*\(", re.IGNORECASE)
_REGEXP_MATCHES = re.compile(r"\bregexp_matches\s*\(", re.IGNORECASE)


def _convert_format(fmt: str) -> str:
    return _DIRECTIVE_RE.sub(lambda m: _STRFTIME_DIRECTIVES[m.group(0)], fmt)


def translate_sql(sql: str) -> str:
    """Rewrite known DuckDB/SQLite idioms to Spark SQL; pass the rest
    through verbatim."""
    out = _STRFTIME_DUCK.sub(
        lambda m: f"date_format({m.group(1)}, '{_convert_format(m.group(2))}')", sql
    )
    out = _STRFTIME_SQLITE.sub(
        lambda m: f"date_format({m.group(2)}, '{_convert_format(m.group(1))}')", out
    )
    out = _EPOCH_MS.sub("unix_millis(", out)
    out = _EPOCH.sub("unix_timestamp(", out)
    out = _REGEXP_MATCHES.sub("regexp_like(", out)
    return out
