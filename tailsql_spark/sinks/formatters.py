"""Output formatters: ``raw``, ``rawv``, ``table``.

Re-expresses ``/root/reference/sink/format.go``:

* ``raw``  — one CSV-ish line per row, values space-joined
  (``format.go:77-98``);
* ``rawv`` — MySQL ``\\G``-style vertical blocks, one ``col: value``
  per line with a row separator (``format.go:100-119``);
* ``table`` — pretty ASCII table with a header rule
  (``format.go:17-75``).

NULLs render as the literal string ``NULL`` (``format.go:64-70``) —
the only place NULL appears in the reference's data model (query
results). Formatter selection/default mirrors
``config/config.go:191-199`` (default ``raw``).

Formatters consume an already-``collect()``-ed small result (one
window's query output — the reference materializes ``*sql.Rows`` the
same way); they never touch distributed data.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def _cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def format_raw(cols: list[str], rows: list[tuple]) -> str:
    lines = [" ".join(cols)]
    lines += [" ".join(_cell(v) for v in r) for r in rows]
    return "\n".join(lines)


def format_rawv(cols: list[str], rows: list[tuple]) -> str:
    out: list[str] = []
    width = max((len(c) for c in cols), default=0)
    for i, r in enumerate(rows, 1):
        out.append(f"*************************** {i}. row ***************************")
        out += [f"{c.rjust(width)}: {_cell(v)}" for c, v in zip(cols, r)]
    return "\n".join(out)


def format_table(cols: list[str], rows: list[tuple]) -> str:
    cells = [[_cell(v) for v in r] for r in rows]
    widths = [
        max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
        for i, c in enumerate(cols)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    def line(vals: list[str]) -> str:
        return "| " + " | ".join(v.ljust(w) for v, w in zip(vals, widths)) + " |"
    out = [sep, line(list(cols)), sep]
    out += [line(r) for r in cells]
    out.append(sep)
    return "\n".join(out)


def raw_line_col(cols: list[str]):
    """The ``raw`` formatter as an EXECUTOR-SIDE expression: one
    space-joined string per row, NULLs as the literal ``NULL``
    (``format.go:64-70``'s rendering, computed where the data lives).

    ``format_raw`` collects then joins driver-side — correct for one
    window's small result, a serialization point for anything larger.
    This column is the distributed path: format in parallel, then sink
    the strings (collect, write.text, or a streaming sink).  Booleans
    render ``true``/``false`` via Spark's string cast, matching
    :func:`_cell`.
    """
    from pyspark.sql import functions as F

    return F.concat_ws(
        " ", *[F.coalesce(F.col(c).cast("string"), F.lit("NULL")) for c in cols]
    )


FORMATTERS = {"raw": format_raw, "rawv": format_rawv, "table": format_table}


def render(df: DataFrame, fmt: str = "raw", max_rows: int | None = None) -> str:
    """Collect a (small) result DataFrame and render it.

    ``max_rows`` is the driver-protection knob: the default (None)
    collects everything — exact reference parity, tailsql prints every
    row of a window's result — but a pathological ``SELECT *`` over a
    huge window would then funnel through the driver, so callers can
    cap the fetch.  The cap is pushed into the PLAN (``limit``), not
    applied post-collect, and truncation is marked so output is never
    silently incomplete.
    """
    try:
        formatter = FORMATTERS[fmt]
    except KeyError:
        raise ValueError(f"unknown formatter {fmt!r}; choose from {sorted(FORMATTERS)}")
    if max_rows is None:
        rows = [tuple(r) for r in df.collect()]
        truncated = False
    else:
        rows = [tuple(r) for r in df.limit(max_rows + 1).collect()]
        truncated = len(rows) > max_rows
        rows = rows[:max_rows]
    out = formatter(df.columns, rows)
    if truncated:
        out += f"\n-- output truncated at {max_rows} rows --"
    return out
