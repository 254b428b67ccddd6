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


# ---------------------------------------------------------------------------
# PromQL label manipulation (operators/labels.py)
# ---------------------------------------------------------------------------

def _lbl_pts(spark, rows):
    return spark.createDataFrame(
        rows, "name string, labels map<string,string>, ts timestamp, "
              "dval double")


def test_label_replace_promql_contract(spark):
    """Full-value anchoring, capture-group expansion, non-match leaves
    labels untouched, absent src matches as '', empty replacement
    removes dst."""
    import datetime as dt

    from open_instrument_spark.operators.labels import label_replace

    t = dt.datetime(2024, 1, 1)
    pts = _lbl_pts(spark, [
        ("/m", {"host": "web-7", "az": "a"}, t, 1.0),
        ("/m", {"host": "db9"}, t, 1.0),          # regex does not match
        ("/m", {"az": "b"}, t, 1.0),              # host absent -> src ''
    ])
    out = label_replace(pts, "rack", "r$1", "host", r"web-(\d+)")
    got = [r["labels"] for r in out.collect()]
    assert got[0] == {"host": "web-7", "az": "a", "rack": "r7"}
    assert got[1] == {"host": "db9"}              # untouched
    assert got[2] == {"az": "b"}                  # '' !~ web-(\d+)
    # partial match must NOT fire (anchored): 'xxweb-7yy'
    out2 = label_replace(
        _lbl_pts(spark, [("/m", {"host": "xxweb-7yy"}, t, 1.0)]),
        "rack", "r$1", "host", r"web-(\d+)")
    assert out2.first()["labels"] == {"host": "xxweb-7yy"}
    # empty replacement removes dst; matching '' via .* sets from absent
    out3 = label_replace(
        _lbl_pts(spark, [("/m", {"host": "web-1", "rack": "old"}, t, 1.0)]),
        "rack", "", "host", r"web-.*")
    assert out3.first()["labels"] == {"host": "web-1"}


def test_label_replace_dialect_divergence(spark):
    """D18 pins: the Java-regex dialect. ${name}-braced named groups
    work like Go's; a ${name} reference to an UNDEFINED group throws
    (Go would expand ''), and Java-only pattern features (lookahead)
    are accepted rather than rejected like RE2."""
    import datetime as dt

    import pytest as _pt
    from pyspark.errors import PySparkException

    from open_instrument_spark.operators.labels import label_replace

    t = dt.datetime(2024, 1, 1)
    pts = _lbl_pts(spark, [("/m", {"host": "web-7"}, t, 1.0)])
    # ${name} braced reference to a DEFINED named group: both dialects
    out = label_replace(pts, "rack", "r${n}", "host", r"web-(?<n>\d+)")
    assert out.first()["labels"] == {"host": "web-7", "rack": "r7"}
    # undefined group reference: Java throws, Go would expand ""
    with _pt.raises(PySparkException):
        label_replace(pts, "rack", "r${nope}", "host",
                      r"web-(?<n>\d+)").collect()
    # Java-only lookahead accepted (RE2/PromQL would reject the call)
    out2 = label_replace(pts, "kind", "frontend", "host", r"(?=web).*")
    assert out2.first()["labels"] == {"host": "web-7", "kind": "frontend"}


def test_label_join_promql_contract(spark):
    """Join with absent srcs as '', always applied, empty result
    removes dst, two-empty-plus-sep stays (strings.Join semantics)."""
    import datetime as dt

    from open_instrument_spark.operators.labels import label_join

    t = dt.datetime(2024, 1, 1)
    pts = _lbl_pts(spark, [
        ("/m", {"a": "x", "b": "y"}, t, 1.0),
        ("/m", {"a": "x"}, t, 1.0),
        ("/m", {"c": "z"}, t, 1.0),
    ])
    got = [r["labels"] for r in
           label_join(pts, "ab", "-", "a", "b").collect()]
    assert got[0] == {"a": "x", "b": "y", "ab": "x-y"}
    assert got[1] == {"a": "x", "ab": "x-"}
    assert got[2] == {"c": "z", "ab": "-"}        # strings.Join('','')='-'
    # single absent src with no sep context: empty result removes dst
    got2 = label_join(pts, "ab", "", "a").collect()[2]["labels"]
    assert got2 == {"c": "z"}


def test_absent_selectors_counts_and_flags(spark):
    """absent() per selector: exact hit, glob hit, label-present hit,
    and a no-match selector flagged absent — all from one aggregation
    pass; distinct SERIES are counted, not samples."""
    import datetime as dt

    from open_instrument_spark.operators.select import absent_selectors

    schema = ("name string, labels map<string,string>, ts timestamp, "
              "dval double, sval string")
    t = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame([
        ("/m/a", {"h": "1"}, t, 1.0, None),
        ("/m/a", {"h": "1"}, t, 2.0, None),     # same series, 2 samples
        ("/m/a", {"h": "2"}, t, 3.0, None),
        ("/m/b", {"h": "1", "k": "x"}, t, 4.0, None),
    ], schema)
    out = {r["selector"]: (r["n_series"], r["absent"])
           for r in absent_selectors(pts, [
               "/m/a", "/m/*", "/m/b{k=*}", "/m/a{k=*}", "/nope"]).collect()}
    assert out["/m/a"] == (2, False)       # distinct series, not samples
    assert out["/m/*"] == (3, False)
    assert out["/m/b{k=*}"] == (1, False)
    assert out["/m/a{k=*}"] == (0, True)   # label never present on /m/a
    assert out["/nope"] == (0, True)


def test_absent_over_time_spine_and_alignment(spark):
    """absent_over_time (r13): every bucket of the range gets a row
    (present AND absent), counts are exact, and an UNALIGNED start
    snaps to the same epoch grid the counts floor onto (no sheared
    join keys → no spuriously-absent buckets)."""
    import datetime as dt

    from open_instrument_spark.operators.select import absent_over_time

    schema = ("name string, labels map<string,string>, ts timestamp, "
              "dval double, sval string")
    base = dt.datetime(2024, 1, 5)
    rows = [
        ("/m/a", {"h": "x"}, base + dt.timedelta(minutes=5), 1.0, None),
        ("/m/a", {"h": "y"}, base + dt.timedelta(minutes=20), 2.0, None),
        # hour 1: nothing
        ("/m/a", {"h": "x"}, base + dt.timedelta(hours=2, minutes=1), 3.0, None),
        ("/m/b", {"h": "x"}, base + dt.timedelta(hours=1), 9.0, None),  # other metric
    ]
    pts = spark.createDataFrame(rows, schema)
    got = {r["window_start"]: (r["n_samples"], r["absent"]) for r in
           absent_over_time(pts, "/m/a", "2024-01-05 00:00:00",
                            "2024-01-05 03:00:00", window_s=3600).collect()}
    assert got == {
        base: (2, False),
        base + dt.timedelta(hours=1): (0, True),
        base + dt.timedelta(hours=2): (1, False),
    }
    # unaligned start (00:30) snaps DOWN to the hour grid: same three
    # buckets, so the hour-0 samples still land in their bucket
    got2 = {r["window_start"]: r["n_samples"] for r in
            absent_over_time(pts, "/m/a", "2024-01-05 00:30:00",
                             "2024-01-05 03:00:00", window_s=3600).collect()}
    assert got2 == {base: 2, base + dt.timedelta(hours=1): 0,
                    base + dt.timedelta(hours=2): 1}


def test_absent_over_time_subsecond_end_and_empty_range(spark):
    """r14 (advisor r13): a sub-second ``end`` must still produce the
    final partial bucket (the old spine stop cast through TIMESTAMP
    seconds and truncated it away), and an empty/inverted range raises
    a clear ValueError instead of an opaque sequence() runtime error."""
    import datetime as dt

    import pytest as _pytest

    from open_instrument_spark.operators.select import absent_over_time

    schema = ("name string, labels map<string,string>, ts timestamp, "
              "dval double, sval string")
    base = dt.datetime(2024, 1, 5)
    pts = spark.createDataFrame(
        [("/m/a", {"h": "x"}, base + dt.timedelta(hours=1, minutes=1), 1.0, None)],
        schema)
    # end = 01:00:00.5 → bucket [01:00, 02:00) is a partial bucket the
    # spine must still carry; the 01:01 sample is OUTSIDE [start, end)
    # so the bucket exists AND reads absent.
    got = {r["window_start"]: (r["n_samples"], r["absent"]) for r in
           absent_over_time(pts, "/m/a", base,
                            base + dt.timedelta(hours=1, milliseconds=500),
                            window_s=3600).collect()}
    assert got == {base: (0, True),
                   base + dt.timedelta(hours=1): (0, True)}
    # ...and a sample inside the partial bucket's [start, end) slice
    # counts.
    pts2 = spark.createDataFrame(
        [("/m/a", {"h": "x"}, base + dt.timedelta(hours=1, microseconds=200),
          1.0, None)], schema)
    got2 = {r["window_start"]: r["n_samples"] for r in
            absent_over_time(pts2, "/m/a", base,
                             base + dt.timedelta(hours=1, milliseconds=500),
                             window_s=3600).collect()}
    assert got2[base + dt.timedelta(hours=1)] == 1
    with _pytest.raises(ValueError, match="empty range"):
        absent_over_time(pts, "/m/a", base, base, window_s=3600)
    with _pytest.raises(ValueError, match="empty range"):
        absent_over_time(pts, "/m/a", base, base - dt.timedelta(hours=1),
                         window_s=3600)
    with _pytest.raises(ValueError, match="1M spine bound"):
        absent_over_time(pts, "/m/a", base, base + dt.timedelta(days=365),
                         window_s=1)
