"""Parquet table loading for the driver's synthetic testdata.

The reference's storage layer (indexed block files with per-variable
offset/min-max-ts indexes, server/record_log.cc:187-271) is subsumed by
Parquet: row-group min/max statistics give the same time-range skipping,
and the FileIndex gives the same file pruning (SURVEY.md §4). Loading is
therefore just ``spark.read.parquet`` — Catalyst owns the scan.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_instrument_spark.model import events_to_points

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=256)
def _nano_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer. Spark has
    no nanos timestamp type; we read them as long (legacy.parquet
    .nanosAsLong) and convert to µs TimestampType — truncating like
    DuckDB/Arrow do on ns→µs."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return tuple(
            f.name
            for f in schema
            if str(f.type).startswith("timestamp[ns")
        )
    except Exception:
        return ()


@dataclass
class Tables:
    spark: SparkSession
    sf_dir: str

    def table(self, name: str) -> DataFrame:
        path = os.path.join(self.sf_dir, f"{name}.parquet")
        df = self.spark.read.parquet(path)
        for c in _nano_ts_columns(path):
            if c in df.columns:
                # integer `div` keeps full precision (double division of
                # epoch-nanos would round the microsecond).
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return self.table(name)
        raise AttributeError(name)

    def points(self) -> DataFrame:
        """The canonical points view over the events table (FIXTURES.md §2)."""
        return events_to_points(self.table("events"))

    def register_views(self) -> None:
        for name in TABLE_NAMES:
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                self.table(name).createOrReplaceTempView(name)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> Tables:
    return Tables(spark, sf_dir or DEFAULT_SF_DIR)


def points_from_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir).points()
