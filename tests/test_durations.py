"""Duration parsing parity with Duration::FromString (lib/timer.cc:86-124;
golden expectations from lib/timer_test / header examples)."""

from __future__ import annotations

import pytest

from open_instrument_spark.functions.durations import parse_duration_ms


@pytest.mark.parametrize(
    "spec,expected_s",
    [
        ("121s", 121),
        ("5m", 300),                     # m = minutes (code, not the header comment)
        ("1h", 3600),
        ("1d", 86400),
        ("1w", 604800),
        ("1y", 31536000),                # 365 d, lib/timer.cc:112
        ("1y1m1w1d1h1s", 31536000 + 60 + 604800 + 86400 + 3600 + 1),
        ("2h30m", 2 * 3600 + 30 * 60),
    ],
)
def test_parse_duration(spec, expected_s):
    assert parse_duration_ms(spec) == expected_s * 1000


def test_numeric_passthrough_is_ms():
    assert parse_duration_ms(30000) == 30000
    assert parse_duration_ms(1500.0) == 1500
    assert parse_duration_ms("30000") == 30000  # digit-only string = ms


@pytest.mark.parametrize("bad", ["1.5h", "1x5s", "5 parsecs", "h", "1h!", ""])
def test_malformed_durations_raise(bad):
    """Fail-fast on structurally malformed or unknown-unit specs —
    documented divergence from the reference's warn-and-drop
    (lib/timer.cc:118-121); a silently shorter duration is worse."""
    with pytest.raises(ValueError):
        parse_duration_ms(bad)
