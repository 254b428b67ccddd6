"""Golden matcher vectors ported from lib/variable_test.cc:43-63
(FIXTURES.md §3.4) plus the Go-only absence matcher
(variable/variable.go:136-141)."""

from __future__ import annotations

import pytest

from open_instrument_spark.functions.match import VariableMatcher

NAME = "/test/variable/1"
LABELS = {"label1": "foobar", "label2": "barfoo", "label3": "1219827391"}

CASES = [
    ("/test/variable/1", True),
    ("/test/variable/2", False),
    ("/test/varia*", True),
    ("/test/notvaria*", False),
    ("/test/variable/1{label1=*}", True),
    ("/test/variable/1{label4=*}", False),
    ("/test/variable/1{label1=foobar}", True),
    ("/test/variable/1{label1=barfoo}", False),
    ("/test/variable/1{label1=/foo.*/}", True),
    ("/test/variable/1{label1=/foo/}", False),  # anchored regex_match
    ("/test/variable/1{label4=}", True),   # absence: label4 missing
    ("/test/variable/1{label1=}", False),  # absence: label1 present
]


@pytest.mark.parametrize("pattern,expected", CASES)
def test_python_matcher(pattern, expected):
    m = VariableMatcher.from_string(pattern)
    assert m.matches(NAME, LABELS) is expected


@pytest.mark.parametrize("pattern,expected", CASES)
def test_spark_matcher(spark, pattern, expected):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(NAME, LABELS)], "name string, labels map<string,string>"
    )
    got = df.filter(VariableMatcher.from_string(pattern).predicate()).count()
    assert (got == 1) is expected


def test_quoted_value_parsing():
    # lib/variable_test.cc:26-41 round-trip form
    m = VariableMatcher.from_string('/test/variable/2{label1=value1,label2="valu\\"e 2"}')
    assert m.labels["label1"].value == "value1"
    assert m.labels["label2"].value == 'valu"e 2'
