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

from open_instrument_spark.functions.match import LabelOp, VariableMatcher
from open_instrument_spark.model import series_key

KEY = st.from_regex(r"[a-z][a-z0-9_]{0,7}", fullmatch=True)
# Values: printable-ish, no ambiguous BARE forms ('*' = presence,
# '/re/' = regex, '' = absence — collisions inherent to the reference's
# string format) and no characters that trigger quoting-with-specials
# edge-ambiguity beyond what the quoter handles (quotes + backslashes are
# exercised; bare backslash-before-quote inside quoted values is the one
# escape the format defines).
VALUE = (
    st.text(
        alphabet=st.characters(
            codec="ascii", min_codepoint=32, max_codepoint=126, exclude_characters="\\"
        ),
        min_size=1,
        max_size=12,
    )
    .filter(lambda v: v != "*")
    .filter(lambda v: not (len(v) >= 2 and v.startswith("/") and v.endswith("/")))
    .filter(lambda v: v == v.strip() or any(c in v for c in ' ,{}="'))
)
LABELS = st.dictionaries(KEY, VALUE, min_size=0, max_size=4)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(labels=LABELS)
def test_series_key_roundtrip(spark, labels):
    df = spark.createDataFrame(
        [("/test/var", labels)], "name string, labels map<string,string>"
    )
    key = df.select(series_key().alias("k")).first()["k"]

    m = VariableMatcher.from_string(key)
    assert m.name == "/test/var"
    parsed = {
        k: spec.value for k, spec in m.labels.items() if spec.op == LabelOp.EQ
    }
    assert parsed == labels
    assert all(spec.op == LabelOp.EQ for spec in m.labels.values())
    # and the matcher built from the canonical form matches the source row
    assert m.matches("/test/var", labels)


def test_empty_values_omitted_from_key(spark):
    df = spark.createDataFrame(
        [("/v", {"a": "", "b": "x"})], "name string, labels map<string,string>"
    )
    key = df.select(series_key().alias("k")).first()["k"]
    assert key == "/v{b=x}"  # empty-valued labels omitted (variable.cc:52-53)
