"""Streaming incremental near-dedup against the persisted LSH index —
the continuous-ingest form of the nightly loop in
``operators/dedup.py`` (write_lsh_index / incremental_dedup_report /
append_lsh_index): each micro-batch is near-deduped against the base
corpus index PLUS every prior micro-batch's keepers, and its own
keepers' band rows join the index for the batches after it.

Exactly-once without a driver-side state blob (same discipline as
``stream_rollup``): both sinks — the kept docs and the keepers' band
rows — are written under ``batch_id=N`` partition directories with
dynamic partition overwrite, so an at-least-once foreachBatch REPLAY of
batch N overwrites its own directories with identical content instead
of appending duplicates. Replay determinism needs one extra guard the
rollup store doesn't: the index read inside the callback EXCLUDES the
current batch_id's own partition (a replayed batch must not see its
first attempt's keepers, or every doc would match itself and the
replay would emit an EMPTY kept set — data loss, not duplication).

Index layout: the base corpus index stays in ``<index>/bands`` +
``<index>/oversized`` (write_lsh_index, unchanged); streamed keepers
accumulate under ``<index>/stream_bands/batch_id=N``. Readers that want
the full index union the two datasets (the oversized guard is the base
corpus's — batch keepers don't refresh it, matching
``append_lsh_index``'s documented cadence).

Scale shape per micro-batch: identical to the batch operator — band
rows of the (small) micro-batch broadcast into a map-only scan of the
base + streamed index; nothing corpus-sized shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_PERMS,
    MINHASH_SEED,
    incremental_dedup_report,
    lsh_band_rows,
)

_STREAM_BANDS = "/stream_bands"


def read_streamed_index_bands(spark, index_path: str,
                              exclude_batch_id: int | None = None) -> DataFrame:
    """Base index bands unioned with streamed keeper bands (if any).
    ``exclude_batch_id`` drops that batch's own partition — the replay
    guard the sink relies on."""
    from pyspark.errors import AnalysisException

    idx = spark.read.parquet(index_path + "/bands") \
        .select("corpus_id", "band", "band_key")
    try:
        streamed = spark.read.parquet(index_path + _STREAM_BANDS)
    except AnalysisException:  # first batch: no streamed partitions yet.
        # ONLY the missing-path case is survivable — a transient I/O or
        # corrupt-footer error must fail the batch (checkpoint retries it)
        # rather than silently dedup against the base index alone and
        # admit duplicates of prior batches' keepers.
        return idx
    if exclude_batch_id is not None:
        streamed = streamed.filter(F.col("batch_id") != int(exclude_batch_id))
    return idx.unionByName(streamed.select("corpus_id", "band", "band_key"))


def near_dedup_sink(id_col: str, text_col: str, index_path: str,
                    kept_path: str, *,
                    num_perms: int = DEFAULT_PERMS,
                    bands: int = DEFAULT_BANDS,
                    seed: int = MINHASH_SEED,
                    max_bucket: int | None = None):
    """foreachBatch callback: near-dedup each micro-batch against the
    base + streamed index, write keepers to ``kept_path/batch_id=N`` and
    their band rows to ``<index>/stream_bands/batch_id=N`` (both
    idempotently overwritten on replay). Use with
    ``writeStream.foreachBatch(...)``, any trigger including availableNow
    backfills."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        idx = read_streamed_index_bands(spark, index_path,
                                        exclude_batch_id=batch_id)
        report = incremental_dedup_report(
            spark, batch_df, id_col, index_path, text_col,
            num_perms=num_perms, bands=bands, seed=seed,
            max_bucket=max_bucket, index_bands=idx)
        kept = batch_df.join(report.filter(F.col("keep")).select(id_col),
                             id_col)
        # pin the decision before mutating the index: both writes below
        # must see the SAME kept set even though the second one changes
        # what a recomputation would match against
        kept = kept.localCheckpoint(eager=True)
        (kept.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(kept_path))
        rows = lsh_band_rows(kept, id_col, text_col, num_perms=num_perms,
                             bands=bands, seed=seed) \
            .withColumnRenamed("_id", "corpus_id")
        (rows.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(index_path + _STREAM_BANDS))

    return process


def start_near_dedup_stream(stream_df: DataFrame, id_col: str,
                            text_col: str, index_path: str, kept_path: str,
                            checkpoint: str, *,
                            num_perms: int = DEFAULT_PERMS,
                            bands: int = DEFAULT_BANDS,
                            seed: int = MINHASH_SEED,
                            max_bucket: int | None = None):
    """Wire the sink to a streaming DataFrame (availableNow trigger, so a
    bounded backlog drains and the query terminates — swap the trigger
    for continuous ingest)."""
    return (stream_df.writeStream
            .foreachBatch(near_dedup_sink(
                id_col, text_col, index_path, kept_path,
                num_perms=num_perms, bands=bands, seed=seed,
                max_bucket=max_bucket))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
