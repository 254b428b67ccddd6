"""Canonical series-key expression vs the reference's string form
(lib/variable_test.cc:26-41: keys sorted, specials quoted, empty values
omitted, bare name without braces)."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_instrument_spark.model import series_key


def _key(spark, name, labels):
    df = spark.createDataFrame([(name, labels)], "name string, labels map<string,string>")
    return df.select(series_key().alias("k")).collect()[0]["k"]


def test_sorted_keys(spark):
    assert (
        _key(spark, "/test/variable/1", {"label2": "b", "label1": "a"})
        == "/test/variable/1{label1=a,label2=b}"
    )


def test_quoting(spark):
    # lib/variable_test.cc:26-41: value with space+quote gets quoted/escaped
    assert (
        _key(spark, "/test/variable/2", {"label1": "value1", "label2": 'valu"e 2'})
        == '/test/variable/2{label1=value1,label2="valu\\"e 2"}'
    )


def test_empty_labels_omitted(spark):
    # variable.cc:52-53: empty-valued labels dropped from canonical form
    assert _key(spark, "/v", {"a": "", "b": "x"}) == "/v{b=x}"
    assert _key(spark, "/v", {"a": ""}) == "/v"
    assert _key(spark, "/v", None) == "/v"
