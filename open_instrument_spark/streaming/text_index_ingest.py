"""Streaming index-at-ingest for lexical retrieval — the BM25 inverted
index (operators/retrieval.py::build_text_index) maintained by the
ingest stream itself: every arriving micro-batch of documents lands in
the document store AND contributes its postings + corpus-statistics
row to the on-disk index, so searches reflect the batch as soon as its
epoch commits. The streaming composition of ``append_to_text_index`` —
the lexical twin of the near-dup loop (streaming/minhash_ingest.py).

Exactly-once discipline (the streaming/ingest.py scheme, all three
sinks): the batch's document rows land in ``{dest}/epoch=N``, its
postings in ``{index}/postings/epoch=N``, and its one-row statistics
in ``{index}/meta/epoch=N`` — all OVERWRITE of the batch's OWN epoch
partitions, and the meta is summed at read time, so a crash anywhere
between the first write and the checkpoint commit replays epoch N as
a byte-identical no-op repair: no read-modify-write exists to corrupt
(the reason the index keeps per-epoch meta rows instead of one
cumulative counter row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from open_instrument_spark.operators.retrieval import append_to_text_index


def start_indexed_ingest(doc_stream: DataFrame, dest_path: str,
                         index_path: str, checkpoint: str,
                         available_now: bool = False,
                         on_batch_complete=None) -> StreamingQuery:
    """Land → index, one checkpointed foreachBatch. ``doc_stream``
    needs (doc_id, text). The index at ``index_path`` must exist
    (``build_text_index`` — possibly over an empty frame for a
    cold-start index); its bucket count is read from the meta, so the
    stream needs no configuration of its own. ``available_now=True``
    drains the available input and terminates (backfill / tests);
    ``on_batch_complete`` is the crash-injection test seam (raising
    there models a crash after both sinks landed but before the
    checkpoint commit — the replay window the per-epoch layout makes
    harmless)."""

    def sink(batch: DataFrame, epoch: int) -> None:
        batch = batch.select("doc_id", "text")
        batch.write.mode("overwrite").parquet(f"{dest_path}/epoch={epoch}")
        # index AFTER landing, both idempotent: a crash between the two
        # replays the whole epoch as an overwrite of the same files
        append_to_text_index(
            batch.sparkSession.read.parquet(f"{dest_path}/epoch={epoch}")
            .select("doc_id", "text"),
            index_path, epoch=epoch,
        )
        if on_batch_complete is not None:
            on_batch_complete(epoch)

    writer = (
        doc_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_landed(spark, dest_path: str) -> DataFrame:
    """The landed document view (epoch partition column folded away)."""
    return spark.read.parquet(dest_path).drop("epoch")


__all__ = ["start_indexed_ingest", "read_landed"]
