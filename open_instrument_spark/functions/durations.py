"""Duration-string parsing, ``121s`` / ``5m`` / ``1y1m1w1d1h1s`` style.

Semantics follow the reference implementation ``Duration::FromString``
(lib/timer.cc:86-124): units s/m/h/d/w/y with m = MINUTES (the header
comment in lib/timer.h:190-193 says "month", the code says minutes — we
follow the code), y = 365 d, summed over all segments, result in ms.
Digits may be separated by spaces. Divergence from the reference:
malformed specs and unknown unit chars RAISE (the reference logs a
warning and drops the segment, lib/timer.cc:118-121) — fail-fast beats
a silently shorter duration.
"""

from __future__ import annotations

import re

_UNIT_SECONDS = {
    "s": 1,
    "m": 60,
    "h": 3600,
    "d": 86400,
    "w": 604800,
    "y": 31536000,  # 365 days, lib/timer.cc:112
}

_SEG_RE = re.compile(r"(\d[\d ]*)\s*([a-zA-Z])")
_WELL_FORMED_RE = re.compile(r"^(\s*\d[\d ]*\s*[a-zA-Z])+\s*$")


def parse_duration_ms(duration: str | int | float) -> int:
    """Parse a duration spec to integer milliseconds.

    Numeric input — or a digit-only string — is passed through as ms
    (proto fields like ``sample_frequency`` are already ms,
    lib/openinstrument.proto:44). Structurally malformed strings
    (fractions like ``1.5h``, trailing junk) raise instead of silently
    mis-parsing; unknown unit letters also raise (divergence from the
    reference, which logs a warning and drops the segment,
    lib/timer.cc:118-121 — fail-fast beats a silently shorter duration).
    """
    if isinstance(duration, (int, float)):
        return int(duration)
    s = duration.strip()
    if s.isdigit():
        return int(s)
    if not _WELL_FORMED_RE.match(s):
        raise ValueError(f"malformed duration {duration!r}")
    total_s = 0
    for digits, unit in _SEG_RE.findall(s):
        mult = _UNIT_SECONDS.get(unit.lower())
        if mult is None:
            raise ValueError(f"unknown duration unit {unit!r} in {duration!r}")
        total_s += int(digits.replace(" ", "")) * mult
    return total_s * 1000
