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


def test_driver_label_values_never_need_quoting(spark):
    """Growth-proofing for every oracle that renders series_key by plain
    concatenation ('user_id=' || user_id || ...): valid only while the
    driver datasets' label values contain no characters the canonical
    grammar quotes. If FIXTURES ever grow a label value with a non-value
    char (or trim-unstable whitespace), this fails loudly — update the
    oracle SQL to quote alongside."""
    import os

    from pyspark.sql import functions as F

    from open_instrument_spark.canonical import NON_VALUE_CHAR_RE
    from open_instrument_spark.model import events_to_points
    from open_instrument_spark.sources.tables import load_tables

    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        path = f"/root/testdata/{sf}"
        if not os.path.exists(path):
            continue
        pts = events_to_points(load_tables(spark, path).table("events"))
        vals = pts.select(
            F.explode(F.map_values("labels")).alias("v")
        ).filter(
            F.col("v").rlike(NON_VALUE_CHAR_RE) | (F.col("v") != F.trim("v"))
        )
        bad = vals.limit(5).collect()
        assert not bad, (
            f"{sf}: label values {[r['v'] for r in bad]} would be quoted "
            "by the canonical grammar — plain-concat oracle series_key "
            "rendering no longer matches; update the oracle SQL"
        )


def test_events_to_points_labels_drop_nulls_every_pattern(spark):
    """The branched label-map build (r14 — map_filter HOF replaced by
    literal-map branches) must drop null-valued entries exactly like
    map_filter did, for every null pattern of (k, user_id): both
    present, only one, neither. Entry ORDER matters too — the map
    feeds series_key and the driver hash."""
    import datetime

    from pyspark.sql import functions as F

    from open_instrument_spark.model import events_to_points

    rows = [
        ("both", 7, '{"k":"5"}'),     # k kept (5 % 3 != 0), uid kept
        ("kdrop", 7, '{"k":"6"}'),    # k dropped (6 % 3 == 0)
        ("nouid", None, '{"k":"5"}'),
        ("none", None, None),
        ("nok", 9, None),
    ]
    df = spark.createDataFrame(
        [(t, u, datetime.datetime(2024, 1, 1), p, 1.0) for t, u, p in rows],
        "event_type string, user_id long, ts timestamp, props string, "
        "value double",
    )
    got = {
        r["name"]: r["labels"]
        for r in events_to_points(df).select("name", "labels").collect()
    }
    assert got["/events/both"] == {"k": "5", "user_id": "7"}
    assert got["/events/kdrop"] == {"user_id": "7"}
    assert got["/events/nouid"] == {"k": "5"}
    assert got["/events/none"] == {}
    assert got["/events/nok"] == {"user_id": "9"}
    # map_filter twin on the same input — entry-for-entry equality
    staged = df.withColumn("_kv", F.get_json_object("props", "$.k"))
    kv = F.col("_kv")
    twin = staged.select(
        F.concat(F.lit("/events/"), F.col("event_type")).alias("name"),
        F.map_filter(
            F.create_map(
                F.lit("k"), F.when(kv.cast("int") % 3 != 0, kv),
                F.lit("user_id"), F.col("user_id").cast("string"),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("labels"),
    )
    want = {r["name"]: r["labels"] for r in twin.collect()}
    assert got == want
