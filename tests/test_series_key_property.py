"""Property-based round-trip: the canonical series_key rendering
(model.series_key, mirroring lib/variable.cc:47-69) must parse back to
the original labels via the matcher's CSV-style parser
(functions/match.py, mirroring lib/variable.cc:21-105) — the reference
asserts this round-trip on hand-picked vectors (lib/variable_test.cc:
26-41); hypothesis widens it to arbitrary values incl. quoting."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from open_instrument_spark.canonical import canonical_variable_py, parse_variable
from open_instrument_spark.functions.match import LabelOp, VariableMatcher
from open_instrument_spark.model import series_key

KEY = st.from_regex(r"[a-z][a-z0-9_]{0,7}", fullmatch=True)
# Values: full printable ASCII including backslash, comma, quote, braces
# (round-5 unification: the shared canonical kernel escapes \ , " so all
# of these round-trip). Only the matcher grammar's inherently ambiguous
# BARE forms are excluded ('*' = presence, '/re/' = regex, '' = absence
# — collisions built into the reference's string format).
VALUE = (
    st.text(
        alphabet=st.characters(codec="ascii", min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=12,
    )
    .filter(lambda v: v != "*")
    .filter(lambda v: not (len(v) >= 2 and v.startswith("/") and v.endswith("/")))
)
LABELS = st.dictionaries(KEY, VALUE, min_size=0, max_size=4)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(labels=LABELS)
def test_series_key_roundtrip(spark, labels):
    df = spark.createDataFrame(
        [("/test/var", labels)], "name string, labels map<string,string>"
    )
    key = df.select(series_key().alias("k")).first()["k"]

    # The Column renderer and the Python twin are bit-identical …
    assert key == canonical_variable_py("/test/var", labels)

    # … the matcher's parse (shared kernel) inverts the rendering …
    m = VariableMatcher.from_string(key)
    assert m.name == "/test/var"
    parsed = {
        k: spec.value for k, spec in m.labels.items() if spec.op == LabelOp.EQ
    }
    assert parsed == labels
    assert all(spec.op == LabelOp.EQ for spec in m.labels.values())
    # … and the matcher built from the canonical form matches the source row.
    assert m.matches("/test/var", labels)

    # The /export parser is the SAME kernel — one more inverse for free.
    assert parse_variable(key) == ("/test/var", labels)


@settings(max_examples=300, deadline=None)
@given(labels=LABELS)
def test_canonical_py_roundtrip_fast(labels):
    """Driver-side (no Spark job) round-trip at 10× the example count:
    parse(render(name, labels)) == (name, labels) over full printable
    ASCII incl. ``\\`` ``,`` ``"`` ``{`` ``}``."""
    key = canonical_variable_py("/test/var", labels)
    assert parse_variable(key) == ("/test/var", labels)


def test_adversarial_vectors_all_agree(spark):
    """Fixed adversarial values through ALL FOUR former implementations'
    entry points (model.series_key Column, canonical_variable_py, the
    matcher parser, the /export parser): one grammar, byte-identical
    renders, exact inverses. These are precisely the values the three
    pre-unification implementations disagreed on (VERDICT r3 #1)."""
    cases = [
        {"v": "back\\slash"},
        {"v": "a,b"},
        {"v": 'q"uote'},
        {"v": "brace{y}"},
        {"v": " lead-and-trail "},
        {"v": "mix\\,of\\\"all"},
        {"v": "tricky\\"},
        {"a": "plain", "b": "with space", "c": "=eq"},
    ]
    df = spark.createDataFrame(
        [("/n", c) for c in cases], "name string, labels map<string,string>"
    )
    keys = [r["k"] for r in df.select(series_key().alias("k")).collect()]
    for labels, key in zip(cases, keys):
        assert key == canonical_variable_py("/n", labels)
        assert parse_variable(key) == ("/n", labels)
        m = VariableMatcher.from_string(key)
        assert {k: s.value for k, s in m.labels.items()} == labels
        assert m.matches("/n", labels)


def test_empty_values_omitted_from_key(spark):
    df = spark.createDataFrame(
        [("/v", {"a": "", "b": "x"})], "name string, labels map<string,string>"
    )
    key = df.select(series_key().alias("k")).first()["k"]
    assert key == "/v{b=x}"  # empty-valued labels omitted (variable.cc:52-53)
