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
forms, applied only OUTSIDE single-quoted string literals: a match
starting inside ``'...'`` is user-visible data (``SELECT 'epoch(x)'``
must stay ``'epoch(x)'``), not syntax.
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
    "%f": "SSSSSS",  # DuckDB %f: microseconds (overridden per dialect below)
    "%j": "DDD",
    "%p": "a",
    "%%": "%",
}

#: SQLite's %f is "fractional seconds SS.SSS" — it INCLUDES the seconds
#: value (https://sqlite.org/lang_datefunc.html), unlike DuckDB's
#: microseconds-only %f.  The SQLite-argument-order branch must use this
#: mapping or the converted query silently changes meaning.
_STRFTIME_DIRECTIVES_SQLITE = {**_STRFTIME_DIRECTIVES, "%f": "ss.SSS"}

_DIRECTIVE_RE = re.compile("|".join(re.escape(k) for k in _STRFTIME_DIRECTIVES))

#: A single-quoted SQL string literal, with '' self-escapes.
_LITERAL_RE = re.compile(r"'(?:[^']|'')*'")

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


def _convert_format(fmt: str, directives: dict[str, str] = _STRFTIME_DIRECTIVES) -> str:
    return _DIRECTIVE_RE.sub(lambda m: directives[m.group(0)], fmt)


def _sub_outside_literals(pattern: re.Pattern, repl, sql: str) -> str:
    """``pattern.sub(repl, sql)``, skipping matches that START strictly
    inside a single-quoted literal — those are data, not syntax.  (A
    match may legitimately SPAN a literal: strftime's format-string
    argument is one.)"""
    spans = [m.span() for m in _LITERAL_RE.finditer(sql)]

    def guarded(m: re.Match) -> str:
        pos = m.start()
        if any(s < pos < e for s, e in spans):
            return m.group(0)
        return repl(m) if callable(repl) else m.expand(repl)

    return pattern.sub(guarded, sql)


def translate_sql(sql: str) -> str:
    """Rewrite known DuckDB/SQLite idioms to Spark SQL; pass the rest
    through verbatim."""
    out = _sub_outside_literals(
        _STRFTIME_DUCK,
        lambda m: f"date_format({m.group(1)}, '{_convert_format(m.group(2))}')",
        sql,
    )
    out = _sub_outside_literals(
        _STRFTIME_SQLITE,
        lambda m: "date_format("
        f"{m.group(2)}, '{_convert_format(m.group(1), _STRFTIME_DIRECTIVES_SQLITE)}')",
        out,
    )
    out = _sub_outside_literals(_EPOCH_MS, "unix_millis(", out)
    out = _sub_outside_literals(_EPOCH, "unix_timestamp(", out)
    out = _sub_outside_literals(_REGEXP_MATCHES, "regexp_like(", out)
    return out
