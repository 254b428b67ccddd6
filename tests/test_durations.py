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
        ("1x5s", 5),                     # unknown unit segment dropped
    ],
)
def test_parse_duration(spec, expected_s):
    assert parse_duration_ms(spec) == expected_s * 1000


def test_numeric_passthrough_is_ms():
    assert parse_duration_ms(30000) == 30000
    assert parse_duration_ms(1500.0) == 1500
