"""S12 second half: the push-exporter client loop.

The reference's in-process counters can push themselves to a store
every N seconds: ``VariableExporter::ExportToStore`` builds an
AddRequest from the current exported variables, stamping the exporter's
extra labels onto each stream (lib/exported_vars.cc:88-105, label
overwrite via ``Variable::SetLabel``), and ``StartExportThread`` /
``ExportThread`` run that on a daemon thread that sleeps the interval
FIRST, then pushes each cycle (lib/exported_vars.cc:129-143); push
errors are logged and swallowed, never fatal (exported_vars.cc:99-102).
The server side enables it at startup (server/store.cc:78-82).

Spark-first shape: the "exported variables" are whatever points
DataFrame a ``snapshot_fn`` returns (an app's metrics table, a
render_export round-trip, a scrape). A push is one batch through THE
standard ingest pipeline (validate → dedup → partitioned write,
sources/ingest.py) — the RPC transport is the declared non-goal
(SURVEY.md §7.4); the loop, labeling, and store write are the behavior.
"""

from __future__ import annotations

import logging
import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_instrument_spark.sources import ingest as batch_ingest

_log = logging.getLogger(__name__)


def with_extra_labels(points: DataFrame, extra_labels: dict[str, str]) -> DataFrame:
    """Stamp exporter labels onto every stream, OVERWRITING existing
    keys — ``Variable::SetLabel`` semantics (lib/exported_vars.cc:70-72,
    92-95): the exporter's label wins over one the variable already
    carries."""
    labels = F.coalesce(
        F.col("labels"),
        F.create_map().cast("map<string,string>"),
    )
    for k, v in extra_labels.items():
        labels = F.map_concat(
            F.map_filter(labels, lambda key, _v: key != F.lit(k)),
            F.create_map(F.lit(k), F.lit(v)),
        )
    # labels rewritten → precomputed series_key/_label_* would be stale
    from open_instrument_spark.model import drop_staged_columns
    return drop_staged_columns(points.withColumn("labels", labels))


def push_exported(snapshot_fn, store_path: str,
                  extra_labels: dict[str, str] | None = None,
                  now=None, n_buckets: int = 16) -> int:
    """One push cycle (``ExportToStore``, lib/exported_vars.cc:88-105):
    snapshot → extra labels → validate/dedup → append to the store.
    Returns the number of samples written (the AddRequest size)."""
    pts = snapshot_fn()
    if extra_labels:
        pts = with_extra_labels(pts, extra_labels)
    cleaned = batch_ingest.ingest_batch(pts, now=now)
    # count + write off ONE materialization; a push payload is an
    # in-process metrics snapshot (KB), so the persist is trivially small
    cleaned = cleaned.persist()
    try:
        n = cleaned.count()
        batch_ingest.write_points(cleaned, store_path, n_buckets=n_buckets,
                                  mode="append")
    finally:
        cleaned.unpersist()
    return n


class ExportThread:
    """``StartExportThread`` analog (lib/exported_vars.cc:129-143): a
    daemon thread pushing every ``interval_s``. Mirrors the reference's
    loop shape — sleep FIRST, then push — and its error policy: a
    failed push logs a warning and the loop continues
    (exported_vars.cc:99-102 catches and warns). ``stop()`` is the
    thread-interrupt clean exit."""

    def __init__(self, snapshot_fn, store_path: str, interval_s: float,
                 extra_labels: dict[str, str] | None = None,
                 now=None, n_buckets: int = 16):
        self._stop = threading.Event()
        self.pushes = 0
        self.samples = 0

        def loop():
            while True:
                if self._stop.wait(interval_s):  # sleep first, like the ref
                    return
                try:
                    self.samples += push_exported(
                        snapshot_fn, store_path, extra_labels=extra_labels,
                        now=now, n_buckets=n_buckets,
                    )
                    self.pushes += 1
                except Exception as e:  # noqa: BLE001 — reference warns+continues
                    _log.warning("Unable to export vars to the datastore: %s", e)

        self._thread = threading.Thread(target=loop, name="export-push",
                                        daemon=True)

    def start(self) -> "ExportThread":
        self._thread.start()
        return self

    def stop(self, timeout: float = 30.0) -> None:
        self._stop.set()
        self._thread.join(timeout)
