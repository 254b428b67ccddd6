"""Streaming kNN-graph maintenance — the graph-store twin of
streaming/semantic_ingest.py (r14; the fifth store kind joins §2.8's
exactly-once ingest machinery): every arriving embedding micro-batch is
absorbed into the on-disk graph store
(``graphstore.absorb_into_knn_graph_store``), which recomputes exactly
the touched cells' edges from the union of all epochs — so the
maintained store stays EQUAL to a fresh ``knn_graph`` over everything
ingested so far, and any graph consumer (clusters / density / label
propagation / coreset) can read a current graph at any time with zero
vector work.

Exactly-once discipline: the batch's vectors land in
``{store}/vectors/epoch=N`` with OVERWRITE (epoch = the checkpointed
batch id), and the per-cell edge rewrite is a deterministic function of
the store's vector state — so a crash-and-replay of epoch N rewrites
the same vector files and recomputes the same edges instead of
double-absorbing (pinned: a crashed-and-replayed run equals a
crash-free twin exactly, and both equal a fresh build). The ingest log
at ``{dest}/epoch=N`` (vec_id, cell) is the same OVERWRITE pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from open_instrument_spark.operators.graphstore import (
    absorb_into_knn_graph_store,
)


def start_graph_ingest(vec_stream: DataFrame, dest_path: str,
                       store_path: str, checkpoint: str,
                       available_now: bool = False,
                       on_batch_complete=None) -> StreamingQuery:
    """Absorb → land, one checkpointed foreachBatch. ``vec_stream``
    needs (vec_id, embedding). The ingest log row is (vec_id, cell)
    under ``{dest}/epoch=N`` — the batch's assignment as the store
    landed it (read back from the absorbed partition, so log and store
    can never disagree)."""

    def sink(batch: DataFrame, epoch: int) -> None:
        spark = batch.sparkSession
        absorb_into_knn_graph_store(
            store_path, batch.select("vec_id", "embedding"), epoch=epoch)
        (
            spark.read.parquet(f"{store_path}/vectors/epoch={epoch}")
            .select("vec_id", F.col("cell").cast("int").alias("cell"))
            .write.mode("overwrite")
            .parquet(f"{dest_path}/epoch={epoch}")
        )
        if on_batch_complete is not None:
            # test seam: raising models a crash AFTER the absorb landed
            # but BEFORE the checkpoint commit
            on_batch_complete(epoch)

    writer = (
        vec_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
