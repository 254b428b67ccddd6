"""open_instrument_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of dparrish/open-instrument.

The reference system (see /root/reference, SURVEY.md) is a distributed
time-series metrics store: labeled series of (timestamp, double|string)
samples, queried with per-stream mutations (rate, delta, resample) and
cross-stream windowed aggregations (sum/avg/min/max/median grouped by
label), plus retention/downsampling policies.

This package re-expresses those semantics Spark-first:

- the storage engine (WAL, indexed blocks, hash ring) is replaced by
  Parquet + Catalyst (predicate pushdown, row-group stats, partition
  pruning give the same data-skipping the reference hand-rolled);
- every query operator is a declarative DataFrame transformation so the
  optimizer — not hand-written iterators — picks the physical plan;
- the only Python-side kernels are the two grid-resampling operators
  (linear interpolation), which Spark has no built-in for; they run as
  Arrow-batched grouped-map Pandas UDFs.

Layout:
  functions/   column-level expression builders (series key, matchers)
  operators/   query operators (select, mutate, aggregate, retention, llm)
  sources/     table loading + batch ingest
  streaming/   Structured Streaming ingest
  plans/       GetRequest-shaped high-level query API
"""

from open_instrument_spark.session import get_spark, prepare  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (keeps `import open_instrument_spark` cheap):

    >>> import open_instrument_spark as oi
    >>> spark = oi.get_spark()
    >>> pts = oi.load_tables(spark, sf_dir).points()
    >>> oi.get(pts, oi.GetRequest("/events/*", mutations=[("rate", None)]))
    """
    from importlib import import_module

    exports = {
        "GetRequest": "open_instrument_spark.plans.api",
        "get": "open_instrument_spark.plans.api",
        "list_variables": "open_instrument_spark.plans.api",
        "load_tables": "open_instrument_spark.sources.tables",
        "events_to_points": "open_instrument_spark.model",
        "series_key": "open_instrument_spark.model",
        "VariableMatcher": "open_instrument_spark.functions.match",
    }
    if name in exports:
        return getattr(import_module(exports[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__version__ = "0.1.0"
