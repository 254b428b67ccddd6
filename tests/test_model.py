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

def _adversarial_events(spark):
    """Events rows exercising every branch of the staged fast paths:
    null patterns, int-castable-but-quotable k values (whitespace
    padding, '+' sign), and %3 drops."""
    import datetime

    rows = [
        ("a", 7, '{"k":"5"}'),       # plain both
        ("b", 7, '{"k":"6"}'),       # k dropped (%3==0)
        ("c", None, '{"k":"5"}'),    # no uid
        ("d", None, None),           # neither
        ("e", 9, None),              # no k
        ("f", 1, '{"k":" 5"}'),      # leading space: castable, QUOTED
        ("g", 1, '{"k":"5 "}'),      # trailing space: castable, QUOTED
        ("h", 1, '{"k":"+5"}'),      # '+' outside value-char set: QUOTED
        ("i", 1, '{"k":"005"}'),     # castable, unquoted
        # (non-int-castable k values are NOT in this set: the events
        # contract casts k to int — ANSI Spark and the DuckDB oracle
        # both throw on malformed ints, so such corpora are rejected
        # identically by both engines rather than silently dropped)
        ("l", 1, '{"nope":"1"}'),    # key absent from json
    ]
    return spark.createDataFrame(
        [(t, u, datetime.datetime(2024, 1, 1), p, 1.0) for t, u, p in rows],
        "event_type string, user_id long, ts timestamp, props string, "
        "value double",
    )


def test_events_series_key_column_equals_canonical_render(spark):
    """r15 staged fast path: the precomputed series_key column (4-way
    branch of concats over staged scalars) must be BIT-identical to the
    generic HOF render of (name, labels) — including the quoting
    branches — and the staged _label_* columns must equal the map
    lookups, on adversarial rows covering every branch."""
    from open_instrument_spark.canonical import canonical_variable
    from open_instrument_spark.model import events_to_points

    pts = events_to_points(_adversarial_events(spark))
    rows = pts.select(
        "name",
        "series_key",
        canonical_variable("name", "labels").alias("_canon"),
        "_label_k",
        F.col("labels").getItem("k").alias("_map_k"),
        "_label_user_id",
        F.col("labels").getItem("user_id").alias("_map_u"),
    ).collect()
    assert rows, "empty adversarial frame"
    for r in rows:
        assert r["series_key"] == r["_canon"], (r["name"], r["series_key"], r["_canon"])
        assert r["_label_k"] == r["_map_k"], (r["name"], r["_label_k"], r["_map_k"])
        assert r["_label_user_id"] == r["_map_u"], r["name"]
    # the quoting branch really fired on the padded/'+' values
    keyed = {r["name"]: r["series_key"] for r in rows}
    assert keyed["/events/f"] == '/events/f{k=" 5",user_id=1}'
    assert keyed["/events/h"] == '/events/h{k="+5",user_id=1}'


def test_events_series_key_column_equals_canonical_full_frame(spark):
    """Same pin over the real driver frame (sf0.01): zero rows where the
    staged key or staged label scalars disagree with the generic path."""
    from open_instrument_spark.canonical import canonical_variable
    from open_instrument_spark.model import events_to_points
    from open_instrument_spark.sources.tables import load_tables

    pts = events_to_points(load_tables(spark, "/root/testdata/sf0.01").table("events"))
    bad = pts.filter(
        ~F.col("series_key").eqNullSafe(canonical_variable("name", "labels"))
        | ~F.col("_label_k").eqNullSafe(F.col("labels").getItem("k"))
        | ~F.col("_label_user_id").eqNullSafe(F.col("labels").getItem("user_id"))
    ).count()
    assert bad == 0


def test_label_rewrites_drop_staged_columns(spark):
    """Any operator that rewrites the labels map must drop the staged
    series_key/_label_* columns — a reused stale key would render the
    PRE-rewrite labels (r15)."""
    from open_instrument_spark.model import events_to_points
    from open_instrument_spark.operators.labels import label_join, label_replace
    from open_instrument_spark.sources.ingest import default_hostname

    pts = events_to_points(_adversarial_events(spark))
    assert "series_key" in pts.columns and "_label_k" in pts.columns
    for out in (
        label_replace(pts, "cohort", "c$1", "user_id", r"(\d)\d*"),
        label_join(pts, "uk", "-", "user_id", "k"),
        default_hostname(pts, "h0"),
    ):
        leaked = [c for c in out.columns
                  if c == "series_key" or c.startswith("_label_")]
        assert not leaked, leaked


def test_matcher_staged_predicate_equals_map_predicate(spark):
    """match_variables over the staged frame must select exactly the
    rows the map-lookup predicate selects, for every matcher op
    (eq/present/absent/regex)."""
    from open_instrument_spark.model import drop_staged_columns, events_to_points
    from open_instrument_spark.operators.select import match_variables

    pts = events_to_points(_adversarial_events(spark))
    plain = drop_staged_columns(pts)
    for pattern in (
        "/events/*{k=*}",
        "/events/*{k=}",
        "/events/*{k=/5.*/}",
        "/events/*{k=5}",
        '/events/*{k=" 5"}',
        "/events/*{user_id=1}",
        "/events/*{user_id=*}",
        "/events/a{k=5,user_id=7}",
    ):
        got = sorted(
            r["name"] for r in match_variables(pts, pattern).select("name").collect()
        )
        want = sorted(
            r["name"] for r in match_variables(plain, pattern).select("name").collect()
        )
        assert got == want, (pattern, got, want)
