"""Driver-contract invariants for __spark_entry__.

The grading driver verifies only the FIRST ``DRIVER_CHECK_WINDOW`` entries
of ``queries()`` against the DuckDB oracle; everything past the window gets
no correctness row at all.  Round 2 lost three previously-green queries to
silent displacement when the registry grew — these tests make that class of
regression loud.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as E  # noqa: E402


def test_registry_fits_driver_window():
    """Every non-deferred query must sit inside the driver's checked window;
    growing the registry past window+len(DEFER_TO_TAIL) requires explicitly
    deferring more long-stable rows."""
    names = list(E.queries())
    assert len(names) - len(E.DEFER_TO_TAIL) <= E.DRIVER_CHECK_WINDOW, (
        "registry outgrew the driver's checked window — extend DEFER_TO_TAIL "
        "with long-stable (multi-round hash-green) rows before adding queries"
    )
    checked = set(names[: E.DRIVER_CHECK_WINDOW])
    for deferred in E.DEFER_TO_TAIL:
        assert deferred in names, f"DEFER_TO_TAIL names unknown query {deferred}"
    # the deferred rows are exactly the ones outside the window
    outside = [n for n in names[E.DRIVER_CHECK_WINDOW:]]
    assert set(outside) <= set(E.DEFER_TO_TAIL)


def test_queries_and_oracle_keys_align():
    qs, sqls = E.queries(), E.oracle_sql()
    assert set(sqls) <= set(qs)
    # rows-only queries (no oracle) must be a deliberate, short list
    rows_only = set(qs) - set(sqls)
    assert rows_only == set(), f"unexpected oracle-less queries: {rows_only}"


def _prior_round_status() -> dict[str, list[bool]]:
    """hash_match history per query across all CORRECTNESS_r*.json files."""
    import json

    out: dict[str, list[bool]] = {}
    for p in sorted(Path(__file__).resolve().parents[1].glob("CORRECTNESS_r*.json")):
        for q, row in json.loads(p.read_text()).items():
            out.setdefault(q, []).append(bool(row.get("hash_match")))
    return out


def test_deferred_rows_are_long_stable():
    """Rotation invariant: a query may be deferred past the driver window
    only if it already holds >=2 hash-green driver rows — nothing unproven
    ever leaves the checked window."""
    hist = _prior_round_status()
    for q in E.DEFER_TO_TAIL:
        greens = sum(hist.get(q, []))
        assert greens >= 2, (
            f"{q} deferred with only {greens} green driver rounds — "
            "defer only multi-round hash-green rows"
        )


def test_rotation_brings_prior_deferred_back():
    """The r3-deferred rows (no row in CORRECTNESS_r03.json) must sit inside
    the checked window this round so they get driver re-verification, along
    with every query that has never been driver-green."""
    hist = _prior_round_status()
    checked = set(list(E.queries())[: E.DRIVER_CHECK_WINDOW])
    r3_deferred = {
        "t5_sections", "t9_t10_guards", "w2_main_json", "p5_title_projection",
        "c7_multi_tenant", "t8_judge_type", "w3_write_files_skip",
        "s10_fixed_range_scan",
    }
    missing = r3_deferred - checked
    assert not missing, f"r3-deferred rows still outside the window: {missing}"
    never_green = {q for q, greens in hist.items() if not any(greens)}
    never_green |= set(E.queries()) - set(hist)  # brand-new queries
    missing = never_green - checked
    assert not missing, f"never-green queries outside the driver window: {missing}"
