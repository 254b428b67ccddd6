"""Pins the driver-window invariant: the driver replays only the first
50 queries() entries (CORRECTNESS_r01.json evidence), so every entry in
that window must carry an oracle, and every oracled query outside the
window must be one of the deliberately demoted redundant variants that
tests/test_oracle_parity.py replays against DuckDB locally."""

from __future__ import annotations

from open_instrument_spark import registry


def test_window_is_first_50_and_fully_oracled():
    names = list(registry.QUERIES)
    assert names[:50] == registry.DRIVER_WINDOW
    assert all(n in registry.ORACLES for n in names[:50])


def test_every_oracled_query_outside_window_is_demoted_on_purpose():
    outside = set(registry.QUERIES) - set(registry.DRIVER_WINDOW)
    oracled_outside = {n for n in outside if n in registry.ORACLES}
    assert oracled_outside == set(registry._PAST_WINDOW_ORACLED)


def test_rows_only_queries_have_no_oracle():
    for n in registry._PAST_WINDOW_ROWS_ONLY:
        assert n in registry.QUERIES and n not in registry.ORACLES
