"""Streaming exact dedup: drop content-duplicate documents from a stream
with Spark's keyed dedup state — the incremental sibling of the batch
`operators/dedup.dedup_keep_canonical`: the SAME md5 content digest
defines what counts as a duplicate, so both paths agree on the
duplicate GROUPS. Which member survives differs by construction: the
stream keeps the FIRST-ARRIVING doc of a digest, the batch path keeps
the MIN-id doc — identical cleaned corpora only when arrival order
matches id order.

Two state regimes:

- ``stream_dedup_exact(stream, keys)`` — plain `dropDuplicates`: state
  grows with the number of DISTINCT keys ever seen. Right for bounded key
  universes (session ids, day-partitioned reprocessing).
- with ``event_time_col`` + ``watermark`` — `dropDuplicatesWithinWatermark`:
  state holds only keys younger than the watermark, so memory is BOUNDED
  by (arrival rate × watermark horizon) no matter how long the stream
  runs. The only shape that survives an unbounded 100-TB crawl stream;
  the contract is weaker (a duplicate arriving later than the watermark
  horizon passes), which is the standard trade.

State lives in the checkpoint like every stateful operator here —
restart-safe through the same recoverable-sink rules documented in
streaming/stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["stream_dedup_exact", "stream_dedup_by_content"]


def stream_dedup_exact(stream_df: DataFrame, key_cols: list[str], *,
                       event_time_col: str | None = None,
                       watermark: str | None = None) -> DataFrame:
    """First occurrence per key; see module docstring for the two state
    regimes. ``watermark`` is a Spark interval string ('10 minutes')."""
    if (event_time_col is None) != (watermark is None):
        raise ValueError("event_time_col and watermark go together")
    if event_time_col is not None:
        return (stream_df.withWatermark(event_time_col, watermark)
                .dropDuplicatesWithinWatermark(key_cols))
    return stream_df.dropDuplicates(key_cols)


def stream_dedup_by_content(stream_df: DataFrame, text_col: str, *,
                            event_time_col: str | None = None,
                            watermark: str | None = None) -> DataFrame:
    """Content dedup: key = md5(text) — the SAME 128-bit digest the batch
    exact-dedup family shuffles on (operators/dedup.py:542), so stream and
    batch agree on what counts as a duplicate. The digest column is
    internal and dropped from the output."""
    if "_digest" in stream_df.columns:
        raise ValueError(
            "stream_dedup_by_content uses an internal _digest column; "
            "rename the input's _digest column first")
    withd = stream_df.withColumn("_digest", F.md5(F.col(text_col)))
    out = stream_dedup_exact(withd, ["_digest"],
                             event_time_col=event_time_col,
                             watermark=watermark)
    return out.drop("_digest")
