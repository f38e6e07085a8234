"""Deterministic sampling operators (bottom-k by seeded hash).

The per-corpus variant lives in plans/textdata_queries.q_hash_sample_docs
(TakeOrderedAndProject — per-partition top-k, k-row merge). This module
adds the STRATIFIED form a training pipeline needs for balanced splits:
exactly k documents per group (language, source, shard), deterministic
across runs / engines / partitionings — unlike rand()-based
df.sampleBy, which is neither exact-k nor stable.

Semantics: per group, the k rows with the smallest seeded affine hash
h(key) = (a*(key mod p) + b) mod p, ties broken by key — a total order,
so the sample is unique and a SQL oracle replays it with ROW_NUMBER().
Equivalent in distribution to uniform-without-replacement per group
(the hash induces a random permutation of keys).

Scale shape (the reason this is not just a Window query): a global
ROW_NUMBER over the corpus shuffles every projected row into a
per-group sort. Phase 1 here cuts each scan partition down to <= k rows
per group it actually holds (pandas sort + group head inside
mapInPandas, memory bounded by the projected partition slice), so the
one window that does run only ever sees <= partitions * groups_present
* k candidate rows — independent of corpus size. Phase 2 is the exact
global per-group top-k over that tiny set. Output equals the Window
answer exactly (the global bottom-k per group survives every
partition-local bottom-k cut, by transitivity of the total order).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window, functions as F

from ..config import affine_sql
from ..sketches.hashing import affine_params

# collapse the phase-1 accumulation whenever it exceeds this many rows —
# bounds per-task memory at O(collapse + batch) regardless of partition size
_COLLAPSE_ROWS = 1 << 18


def stratified_hash_sample(df: DataFrame, group_col: str, key_col: str,
                           k: int, seed: int, *,
                           payload_cols: list[str] | None = None) -> DataFrame:
    """Exactly k rows per group (fewer if the group is smaller),
    deterministic bottom-k by seeded hash of ``key_col``. Returns the
    projected columns + ``sample_h`` (the hash, so oracles can replay
    the order)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    a, b = affine_params(seed, 1)
    h = F.expr(affine_sql(int(a[0]), int(b[0]), f"CAST({key_col} AS BIGINT)"))
    cols = [group_col, key_col] + [c for c in (payload_cols or [])
                                   if c not in (group_col, key_col)]
    # NULL keys have no defined position in the hash order — and worse,
    # phase 1 (pandas sort: NaN LAST) and phase 2 (Spark window asc:
    # NULLS FIRST) would disagree on where a NULL sample_h ranks, so a
    # NULL-key row could be cut in phase 1 yet rank inside the top k in
    # phase 2. Contract: NULL keys are excluded from the sample frame.
    proj = (df.select(*cols).withColumn("sample_h", h)
            .filter(F.col("sample_h").isNotNull()))
    schema = proj.schema

    def part_topk(pdfs: Iterator) -> Iterator:
        import pandas as pd

        acc: list = []
        held = 0

        def cut(frames: list):
            merged = pd.concat(frames, ignore_index=True)
            merged = merged.sort_values(["sample_h", key_col], kind="mergesort")
            # dropna=False: a NULL group is a group — the phase-2 window
            # and the ROW_NUMBER oracle both keep a NULL partition, so
            # dropping it here would silently lose those rows
            return merged.groupby(group_col, sort=False, dropna=False).head(k)

        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            acc.append(pdf)
            held += len(pdf)
            if held > _COLLAPSE_ROWS and len(acc) > 1:
                acc = [cut(acc)]
                held = len(acc[0])
        if acc:
            yield cut(acc)

    cand = proj.mapInPandas(part_topk, schema)
    w = Window.partitionBy(group_col).orderBy("sample_h", key_col)
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
