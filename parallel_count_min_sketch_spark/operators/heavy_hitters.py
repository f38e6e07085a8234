"""Scalable heavy hitters: CMS + per-partition candidate tracking.

The exact-distinct candidate pass used by the small-scale query
(plans/cms_queries.q_cms_heavy_hitters) shuffles every distinct token —
fine at test scale, wrong at 100 TB. This operator keeps the shuffle at
O(partitions x k):

  stage 1: each partition counts its own tokens exactly (np.unique on the
           local batch stream) and emits its top-k as candidates;
  stage 2: union + distinct of candidates (tiny), CMS point query via the
           broadcast sketch-table join, filter est >= phi*N.

Guarantee: with k >= 1/phi, any item with global share >= phi has share
>= phi in at least one partition (pigeonhole on the weighted average),
so every true heavy hitter is a candidate; CMS one-sidedness then keeps
it through the filter — no false negatives. False positives are bounded
by the CMS eps as usual.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..config import CMSConfig
from ..memtune import tune_allocator
from .sql_build import cms_table_df, point_query_join

CAND_SCHEMA = "token STRING, local_count LONG"


def candidate_tokens(df, text_col: str, k_per_partition: int, *, sep: str = " "):
    """Per-partition exact top-k tokens (one small row set per partition)."""
    import pyarrow.compute as pc

    proj = df.select(text_col)

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tune_allocator()
        # Arrow-native throughout: per-batch value_counts stay as Arrow
        # tables, one vectorized group_by/sum + sort merges them at the
        # end. No per-distinct-token Python objects — at 100x scale a
        # partition's distinct set is millions of entries and a Python
        # dict fold would dominate the partition's wall time.
        parts: list[pa.Table] = []
        for batch in batches:
            col = batch.column(0)
            if col.null_count:
                col = col.drop_null()
            toks = pc.list_flatten(pc.split_pattern(col, sep))
            if len(toks) == 0:
                continue
            vc = pc.value_counts(toks)
            parts.append(pa.table({"token": vc.field("values"),
                                   "cnt": vc.field("counts")}))
        if parts:
            merged = pa.concat_tables(parts) \
                .group_by("token").aggregate([("cnt", "sum")])
            merged = merged.filter(pc.not_equal(merged.column("token"), ""))
            top = merged.sort_by([("cnt_sum", "descending"),
                                  ("token", "descending")])[:k_per_partition]
            yield pa.RecordBatch.from_arrays(
                [top.column("token").combine_chunks().cast(pa.string()),
                 top.column("cnt_sum").combine_chunks().cast(pa.int64())],
                schema=pa.schema([("token", pa.string()),
                                  ("local_count", pa.int64())]),
            )

    return proj.mapInArrow(fold, CAND_SCHEMA)


def heavy_hitters_scalable(df, text_col: str, cfg: CMSConfig, phi: float, *,
                           k_per_partition: int | None = None) -> DataFrame:
    """EXACT heavy hitters (token, exact_count, cms_estimate) at threshold
    floor(phi*N), computed without ever shuffling the distinct-token
    universe:

      1. sketch build (JVM path, one scan; shuffle bounded by depth*width);
      2. per-partition top-k candidates (pigeonhole: with k >= 1/phi the
         candidate union contains every true heavy hitter);
      3. CMS prune: candidates with estimate < floor(phi*N) are dropped —
         one-sidedness (est >= true) means no true HH is lost;
      4. exact recount of the tiny surviving set (broadcast semi-join
         against the token stream), final filter exact_count >= threshold.

    Output therefore equals the exact heavy-hitter set regardless of
    partitioning — value-checkable against a plain SQL GROUP BY oracle —
    while every shuffle stays O(partitions*k + depth*width), never
    O(distinct tokens).
    """
    if k_per_partition is None:
        k_per_partition = max(16, int(2.0 / phi))
    toks = df.select(F.explode(F.split(text_col, " ")).alias("tok")) \
        .filter(F.col("tok") != "")
    # pre_aggregate=False: the distinct-first plan would shuffle one row per
    # DISTINCT token — on the high-distinct corpora this operator targets
    # that breaks the bounded-shuffle guarantee above. The per-occurrence
    # bucket aggregate keeps every shuffle <= depth*width rows/partition.
    table = cms_table_df(toks, "tok", cfg, string_items=True,
                         pre_aggregate=False)
    table.cache()
    n = (
        table.filter(F.col("depth_row") == 0)
        .agg(F.sum("counter").alias("n")).collect()[0]["n"]
    )
    thresh = int(phi * n)
    cands = candidate_tokens(df, text_col, k_per_partition) \
        .select("token").distinct()
    ests = point_query_join(table, cands, "token", cfg, probes_are_strings=True)
    survivors = (
        ests.filter(F.col("cms_estimate") >= thresh)
        .select(F.col("item").alias("token"), "cms_estimate")
    )
    exact = (
        toks.join(F.broadcast(survivors), toks["tok"] == survivors["token"])
        .groupBy("token", "cms_estimate")
        .agg(F.count("*").alias("exact_count"))
    )
    return (
        exact.filter(F.col("exact_count") >= thresh)
        .select("token", "exact_count", "cms_estimate")
        .orderBy(F.desc("exact_count"), "token")
    )
