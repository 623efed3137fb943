"""Registry integrity: a broken extension import must never silently
shrink ``queries()`` (round-1 verdict item #4), and the driver's graded
window (first 50 dict entries) must stay pinned to the family
representatives."""

from __future__ import annotations

from tailsql_spark.plans.registry import (
    GRADED_WINDOW,
    IMPORT_FAILURES,
    REGISTRY,
)

EXPECTED_TOTAL = 140


def test_no_silent_import_failures():
    assert IMPORT_FAILURES == {}, f"extension modules failed to import: {IMPORT_FAILURES}"


def test_registry_size_exact():
    # An exact count: any accidental drop (or unregistered new query)
    # fails loudly here instead of silently vanishing from the driver's
    # correctness gate.
    assert len(REGISTRY) == EXPECTED_TOTAL, (
        f"registry has {len(REGISTRY)} queries, expected {EXPECTED_TOTAL}; "
        f"diff from graded window: {set(GRADED_WINDOW) - set(REGISTRY)}"
    )


def test_graded_window_is_first_50():
    assert len(GRADED_WINDOW) == 50
    assert tuple(list(REGISTRY)[:50]) == GRADED_WINDOW


def test_graded_window_all_have_oracles():
    # Every driver-graded entry must carry a DuckDB oracle so it gets
    # the full three-check row (rows + schema + value hash).
    missing = [n for n in GRADED_WINDOW if REGISTRY[n].oracle is None]
    assert missing == [], f"graded-window queries without oracle SQL: {missing}"


def test_every_query_has_build():
    for name, spec in REGISTRY.items():
        assert callable(spec.build), name
