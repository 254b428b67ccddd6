"""S12 /export text-format scrape source: line grammar (quoted labels,
multi-value lines, string variables), malformed-line skipping, and
composition with the standard ingest pipeline."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from open_instrument_spark.sources.export_scrape import parse_variable, scrape_export

TS = dt.datetime(2024, 1, 30, 12, 0, 0)


def test_parse_variable_grammar():
    # plain, labeled, quoted (with escaped quote + comma inside), spaces
    assert parse_variable("/proc/load") == ("/proc/load", {})
    assert parse_variable("/x{host=a,job=web}") == ("/x", {"host": "a", "job": "web"})
    assert parse_variable('/x{msg="a,b \\"c\\"",k=v}') == (
        "/x", {"msg": 'a,b "c"', "k": "v"}
    )
    with pytest.raises(ValueError):
        parse_variable("/x{unterminated")
    with pytest.raises(ValueError):
        parse_variable("/x{noequals}")


def test_scrape_export_lines(spark):
    lines = spark.createDataFrame(
        [
            ("/proc/loadavg{host=a}\t0.25",),                  # numeric
            ("/os/name{host=a}\tUbuntu 22.04",),               # string sample
            ("/net/errors{host=a,iface=\"eth0,0\"}\t3\t4",),   # quoted + 2 values
            ("garbage-without-tab",),                          # skipped
            ("/bad{unterminated\t1",),                         # malformed var: skipped
            ("",),                                             # empty: skipped
        ],
        "value string",
    )
    pts = scrape_export(lines, TS)
    rows = {
        (r["name"], tuple(sorted((r["labels"] or {}).items())), r["dval"], r["sval"])
        for r in pts.collect()
    }
    assert rows == {
        ("/proc/loadavg", (("host", "a"),), 0.25, None),
        ("/os/name", (("host", "a"),), None, "Ubuntu 22.04"),
        ("/net/errors", (("host", "a"), ("iface", "eth0,0")), 3.0, None),
        ("/net/errors", (("host", "a"), ("iface", "eth0,0")), 4.0, None),
    }
    assert {r["ts"] for r in pts.collect()} == {TS}


def test_scrape_export_per_row_ts_and_ingest_compose(spark):
    """Fetcher-recorded per-row scrape timestamps + the standard ingest
    pipeline (hostname defaulting, validation, dedup) downstream."""
    from open_instrument_spark.sources.ingest import ingest_batch

    lines = spark.createDataFrame(
        [
            ("/a\t1.0", TS),
            ("/a\t1.0", TS),                   # scrape replay → dedup
            ("bad name\t9", TS),               # fails validate (no leading /)
        ],
        "value string, scraped_at timestamp",
    )
    pts = scrape_export(lines, "scraped_at")
    out = ingest_batch(pts, source_host="h1", now="2024-01-31 00:00:00")
    rows = [(r["name"], r["labels"], r["dval"]) for r in out.collect()]
    assert rows == [("/a", {"hostname": "h1"}, 1.0)]


# Property: the scrape parser is a true inverse of the canonical
# series-key rendering (same strategies as test_series_key_property.py).
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from open_instrument_spark.model import series_key  # noqa: E402

KEY = st.from_regex(r"[a-z][a-z0-9_]{0,7}", fullmatch=True)
# Full printable ASCII incl. backslash — the round-5 shared kernel
# escapes \ , " so every printable value round-trips.
VALUE = st.text(
    alphabet=st.characters(codec="ascii", min_codepoint=32, max_codepoint=126),
    min_size=1,
    max_size=12,
)
LABELS = st.dictionaries(KEY, VALUE, min_size=0, max_size=4)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(labels=LABELS)
def test_parse_variable_inverts_canonical_key(spark, labels):
    df = spark.createDataFrame(
        [("/test/var", labels)], "name string, labels map<string,string>"
    )
    key = df.select(series_key().alias("k")).first()["k"]
    name, parsed = parse_variable(key)
    assert name == "/test/var"
    assert parsed == labels


def test_scrape_ts_typo_raises(spark):
    lines = spark.createDataFrame([("/a\t1",)], "value string")
    with pytest.raises(ValueError, match="neither a column"):
        scrape_export(lines, "scrape_time_typo")
    # ISO literals and datetime objects still accepted
    scrape_export(lines, "2024-01-30 12:00:00")
    scrape_export(lines, TS)


# ---------------------------------------------------------------------------
# /export renderer: parse(render(points)) == points (verdict r2 item 5)
# ---------------------------------------------------------------------------

from open_instrument_spark.sources.export_scrape import render_export  # noqa: E402

# Renderer values may contain backslashes (render escapes them — a
# lossless refinement over the reference exporter, which leaves '\' raw
# and unparseable). Tabs/newlines stay excluded: the line format frames
# on them, so they can't round-trip in the reference format either.
RVALUE = st.text(
    alphabet=st.characters(codec="ascii", min_codepoint=32, max_codepoint=126),
    min_size=1,
    max_size=12,
).filter(lambda v: v == v.strip() or any(c in v for c in ' ,{}="'))
RLABELS = st.dictionaries(KEY, RVALUE, min_size=0, max_size=3)


def _is_number(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


SAMPLE = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(
        alphabet=st.characters(codec="ascii", min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=10,
    ).filter(lambda s: s == s.strip() and not _is_number(s)),
)
STREAMS = st.lists(
    st.tuples(st.sampled_from(["/a/x", "/a/y", "/b"]), RLABELS,
              st.lists(SAMPLE, min_size=1, max_size=3)),
    min_size=1,
    max_size=3,
)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(streams=STREAMS)
def test_render_scrape_round_trip(spark, streams):
    """parse(render(points)) == points over (name, labels, value) —
    timestamps are assigned at scrape time by design (the /export page
    carries values only, exported_vars.cc:63-86)."""
    rows = []
    for i, (name, labels, samples) in enumerate(streams):
        for j, s in enumerate(samples):
            dv, sv = (s, None) if isinstance(s, float) else (None, s)
            rows.append((name, labels, TS + dt.timedelta(seconds=i * 100 + j), dv, sv))
    pts = spark.createDataFrame(
        rows, "name string, labels map<string,string>, ts timestamp, "
              "dval double, sval string"
    )
    lines = render_export(pts)
    back = scrape_export(lines, TS, line_col="line")
    def key(t):
        return (t[0], t[1], t[2] is None, t[2] or 0.0, t[3] or "")

    got = sorted(
        (
            (r["name"], tuple(sorted((r["labels"] or {}).items())), r["dval"],
             r["sval"])
            for r in back.collect()
        ),
        key=key,
    )
    # renderer merges streams by canonical variable; labels maps with the
    # same canonical form are one stream — compare as multisets of points
    want = sorted(
        (
            (name, tuple(sorted(labels.items())), dv, sv)
            for name, labels, samples in streams
            for dv, sv in (
                ((s, None) if isinstance(s, float) else (None, s)) for s in samples
            )
        ),
        key=key,
    )
    assert got == want


# ----------------------------------------------------- push exporter (S12)
def _snapshot_points(spark, n=4):
    rows = [
        ("/app/counter", {"host": "a", "job": "x"}, float(i),
         dt.datetime(2024, 1, 30, 0, 0, i)) for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "name string, labels map<string,string>, dval double, ts timestamp"
    )
    return df.select("name", "labels", "ts", "dval",
                     F.lit(None).cast("string").alias("sval"))


def test_push_exported_labels_and_append(spark, tmp_path):
    """ExportToStore analog (lib/exported_vars.cc:88-105): snapshot →
    extra labels (OVERWRITING an existing key, SetLabel semantics) →
    ingest pipeline → append; a second push appends rather than
    replacing."""
    from open_instrument_spark.sources.export_push import push_exported

    store = str(tmp_path / "store")
    n1 = push_exported(lambda: _snapshot_points(spark), store,
                       extra_labels={"job": "exporter", "dc": "eu"},
                       now=dt.datetime(2024, 1, 31))
    assert n1 == 4
    back = spark.read.parquet(store)
    assert back.count() == 4
    labels = back.select("labels").first()["labels"]
    assert labels["job"] == "exporter"  # overwrote the stream's own value
    assert labels["dc"] == "eu" and labels["host"] == "a"

    n2 = push_exported(lambda: _snapshot_points(spark, n=2), store,
                       now=dt.datetime(2024, 1, 31))
    assert n2 == 2 and spark.read.parquet(store).count() == 6


def test_export_thread_pushes_periodically_and_survives_errors(spark, tmp_path):
    """ExportThread analog (lib/exported_vars.cc:129-143): sleeps the
    interval first, pushes every cycle, logs-and-continues on a failed
    push, and stops cleanly."""
    import time as _time

    from open_instrument_spark.sources.export_push import ExportThread

    store = str(tmp_path / "store")
    calls = {"n": 0}

    def flaky_snapshot():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient scrape failure")
        return _snapshot_points(spark, n=3)

    t = ExportThread(flaky_snapshot, store, interval_s=0.2,
                     now=dt.datetime(2024, 1, 31)).start()
    deadline = _time.monotonic() + 30
    while t.pushes < 2 and _time.monotonic() < deadline:
        _time.sleep(0.2)
    t.stop()
    assert calls["n"] >= 3  # first call failed, loop kept going
    assert t.pushes >= 2 and t.samples == 3 * t.pushes
    assert spark.read.parquet(store).count() == 3 * t.pushes
