"""Structured Streaming ingestion for the transcript corpus.

The reference is strictly batch (SURVEY.md §2.9) — its "ingest" is a
threaded CSV→``_bulk`` loop (``import_csv.py:280-284``). The Spark-native
upgrade splits the pipeline: *ingestion* is a continuous stream (new
transcript files land, get deduplicated, and append to the corpus table);
*index build* stays batch-resumable (``build.build_index`` with
``resume=True`` re-runs only stages whose inputs changed). This mirrors how
Lucene separates document ingestion from segment building.

Everything here is standard Structured Streaming surface:

- file-source ``readStream`` with the explicit transcript schema (no
  inference — schema discipline per SURVEY.md §1.3)
- watermarked ``dropDuplicatesWithinWatermark`` on the document key
  (conv_id, turn_idx): exactly-once corpus rows even when an upstream
  producer re-delivers a file; state is bounded by the watermark (at
  10^12-turn scale unbounded dedup state is not an option)
- windowed per-hour rollups with late-data tolerance — the streaming twin of
  the batch ``events_hourly`` operator

Each query runs with ``trigger(availableNow=True)`` in tests: it drains all
pending input, checkpoints, and stops — the same code runs 24/7 with a
processing-time trigger in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import TRANSCRIPT_SCHEMA


def transcript_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of transcript parquet drops."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def deduped(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once turns under re-delivery: watermark-bounded dedup state on
    the document key. Late rows beyond the watermark are dropped (the
    explicit lateness contract a 10^12-turn stream needs)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def ingest_corpus(
    stream: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Append deduplicated turns to the corpus table; resumable via the
    streaming checkpoint (the streaming twin of the build manifests).
    Returns the StreamingQuery (caller awaits termination)."""
    writer = (
        deduped(stream, watermark)
        .writeStream.format("parquet")
        .option("path", corpus_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hourly_turn_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per (hour, role) turn counts with late-data tolerance — windowed
    streaming aggregation (update/append per sink semantics)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "role",
            "n_turns",
        )
    )


def maintain_index(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_cols: list[str] | None = None,
    text_col: str = "text",
    watermark: str = "1 hour",
    available_now: bool = True,
    run_prefix: str = "stream",
):
    """Continuous INDEX maintenance: every micro-batch of deduplicated turns
    appends to the inverted index through ``append.append_index`` with
    ``run_id = f"{run_prefix}-{batch_id:09d}"``.

    Exactly-once by composition of two contracts: Structured Streaming
    replays a failed micro-batch under the SAME batch_id (the foreachBatch
    idempotent-sink protocol), and append's per-run_id publish is
    rerun-idempotent (manifest recovery, dynamic partition overwrite,
    dictionary-backup restore — append.py). A crash anywhere between the
    batch's first write and its manifest publish is healed by the replay;
    a completed batch replayed after a checkpoint-only restart is skipped
    outright by its manifest.

    Operational contract: the streaming CHECKPOINT and the INDEX are one
    unit — resetting the checkpoint while keeping the index renumbers
    batch_ids from 0 and the old manifests would silently skip the new
    batch 0; rotate ``run_prefix`` (a fresh run-id lineage) if the
    checkpoint must be rebuilt. Batches arrive sequentially (Structured
    Streaming never runs two foreachBatch invocations of one query
    concurrently), matching append's single-writer requirement; the
    watermarked dedup bounds re-delivery within the stream, and the caller
    guarantees keys are globally new (same contract as batch append).

    Returns the StreamingQuery (caller awaits termination).
    """
    from ..append import append_index

    cols = list(id_cols or ["conv_id", "turn_idx"])

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_index(
            batch_df.sparkSession,
            batch_df,
            index_dir,
            run_id=f"{run_prefix}-{int(batch_id):09d}",
            id_cols=cols,
            text_col=text_col,
        )

    writer = (
        deduped(stream, watermark)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def route_stream(
    stream: DataFrame,
    queries: list[tuple],
    output_dir: str,
    checkpoint_dir: str,
    id_cols: list[str] | None = None,
    text_col: str = "text",
    watermark: str = "1 hour",
    available_now: bool = True,
    analyzer: tuple = ((), False, ()),
):
    """Continuous percolation (ES percolator over a stream): every
    micro-batch of deduplicated turns is matched against the STORED
    standing-query registry (``query.percolate``) and the match pairs land
    as parquet partitioned by batch — the routing/alerting pattern
    (which arriving transcripts trip which standing queries).

    The registry parses once at query start (driver-side, bounded by the
    registry) and the per-batch transform is stateless, so exactly-once
    is simply the foreachBatch idempotent-sink protocol: a replayed batch
    overwrites its own ``batch=<id>`` partition (dynamic partition
    overwrite semantics via the per-batch subdirectory path). Returns the
    StreamingQuery (caller awaits termination).
    """
    import os

    from ..query import parse_percolator_registry, percolate_registry

    cols = list(id_cols or ["conv_id", "turn_idx"])
    # parse + build the broadcast registry tables ONCE at query start;
    # each micro-batch pays only the match. No isEmpty pre-check: writing
    # an empty batch's (empty) match set is harmless, keeps replay
    # idempotent, and guarantees the output dir exists after a drain.
    registry = parse_percolator_registry(stream.sparkSession, queries,
                                         analyzer=analyzer)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select(
            F.concat_ws("#", *[F.col(c).cast("string") for c in cols])
            .alias("doc_key"), F.col(text_col).alias("text"))
        percolate_registry(registry, docs, id_col="doc_key").write.mode(
            "overwrite"
        ).parquet(os.path.join(output_dir, f"batch={int(batch_id)}"))

    writer = (
        deduped(stream, watermark)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
