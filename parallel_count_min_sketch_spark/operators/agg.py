"""Spark aggregation layer: the mergeable-UDAF emulation.

PySpark has no user-defined mergeable aggregate, so we implement the
partial/final pattern explicitly — the same two-level design as the
reference's per-rank partial sketch + MPI_Reduce merge
(src/mpi/mpiV2.c:131-175) and its OpenMP thread-private variant
(src/openmp/openmpV1.c:73-105):

  stage 1 (map):   ``mapInArrow`` over the item column; each task folds its
                   Arrow batches into ONE numpy sketch (np.bincount per hash
                   row — no per-row Python) and emits a single serialized
                   partial-sketch row (~tens of KB).
  stage 2 (reduce): associative element-wise merge of the partials — a
                   tree reduction (``RDD.treeReduce``), exactly what
                   MPI_Reduce does internally.

At 100 TB the stage-1 output is one small row per input split, so the
"shuffle" is a few MB regardless of input size; the build is embarrassingly
parallel, which is what makes the >=0.8 N->4N scaling efficiency criterion
reachable.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pyarrow as pa

from ..config import CMSConfig
from ..memtune import tune_allocator
from ..sketches.cms import CountMinSketch
from ..sketches.hashing import djb2_batch

# Bound per-call scratch memory in worker kernels: chunked processing keeps
# the first-touch page-fault cost per worker tiny and the working set in
# cache (see memtune.py for why this matters here).
CHUNK_TOKENS = 1 << 17

PARTIAL_SCHEMA = "partition_id INT, rows_seen LONG, total LONG, sketch BINARY"
_PARTIAL_PA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("rows_seen", pa.int64()),
        ("total", pa.int64()),
        ("sketch", pa.binary()),
    ]
)


def _partial_batch(pid: int, rows_seen: int, sk: CountMinSketch) -> pa.RecordBatch:
    return pa.RecordBatch.from_pydict(
        {
            "partition_id": [pid],
            "rows_seen": [rows_seen],
            "total": [sk.total],
            "sketch": [sk.to_bytes()],
        },
        schema=_PARTIAL_PA,
    )


def _task_partition_id() -> int:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    return ctx.partitionId() if ctx is not None else -1


def _items_from_array(col: pa.Array, string_items: bool) -> np.ndarray:
    if string_items:
        return djb2_batch(col)
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def cms_partials(df, item_col: str, cfg: CMSConfig, *, weight_col: str | None = None,
                 string_items: bool = False, skip_partitions: frozenset[int] | None = None):
    """DataFrame[item(, weight)] -> DataFrame[partition_id, rows_seen, total, sketch]
    with exactly one row per input partition (the per-rank partial sketch,
    reference src/mpi/mpiV2.c:131-140). ``skip_partitions``: checkpointed
    partitions whose compute (and output row) is skipped on resume."""
    cols = [item_col] + ([weight_col] if weight_col else [])
    proj = df.select(*cols)

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tune_allocator()
        if skip_partitions and _task_partition_id() in skip_partitions:
            return
        sk = cfg.new_sketch()
        rows = 0
        for batch in batches:
            col = batch.column(0)
            if col.null_count or (weight_col and batch.column(1).null_count):
                import pyarrow.compute as pc

                keep = col.is_valid()
                if weight_col:
                    # null weight = no occurrences (SQL SUM semantics),
                    # not int64(nan) garbage
                    keep = pc.and_(keep, batch.column(1).is_valid())
                batch = batch.filter(keep)
                col = batch.column(0)
            weights_all = (
                batch.column(1).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                if weight_col
                else None
            )
            if weights_all is not None and (weights_all < 0).any():
                # same contract as the generic rails (_weighted_update):
                # negative counts would break the one-sided CMS guarantee
                raise ValueError("negative weights are not allowed in sketch builds")
            for lo in range(0, len(col), CHUNK_TOKENS):
                chunk = col.slice(lo, CHUNK_TOKENS)
                items = _items_from_array(chunk, string_items)
                weights = weights_all[lo:lo + CHUNK_TOKENS] if weight_col else None
                sk.update_batch(items, weights)
                rows += len(items)
        yield _partial_batch(_task_partition_id(), rows, sk)

    return proj.mapInArrow(fold, PARTIAL_SCHEMA)


def cms_text_partials(df, text_col: str, cfg: CMSConfig, *, sep: str = " ",
                      skip_partitions: frozenset[int] | None = None):
    """Sketch the token stream of a text column without a JVM-side explode:
    each Arrow batch's strings are tokenized in Arrow C kernels, then
    djb2-hashed as one vector. One partial row per partition."""
    import pyarrow.compute as pc

    proj = df.select(text_col)

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tune_allocator()
        if skip_partitions and _task_partition_id() in skip_partitions:
            return
        sk = cfg.new_sketch()
        rows = 0
        for batch in batches:
            col = batch.column(0)
            if col.null_count:
                col = col.drop_null()
            # tokenize + flatten + filter entirely in Arrow C kernels
            tokens = pc.list_flatten(pc.split_pattern(col, sep))
            if len(tokens):
                tokens = pc.filter(tokens, pc.not_equal(tokens, ""))
            if len(tokens) == 0:
                continue
            # collapse to (distinct token, count) in Arrow C before
            # hashing: djb2 + bincount then run once per DISTINCT token
            # per batch (Zipfian text: ~9k distinct vs ~400k occurrences
            # per batch), with the exact same weighted-update result
            vc = pc.value_counts(tokens)
            vals = vc.field("values")
            counts = vc.field("counts").to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
            for lo in range(0, len(vals), CHUNK_TOKENS):
                chunk = vals.slice(lo, CHUNK_TOKENS)
                w = counts[lo:lo + CHUNK_TOKENS]
                sk.update_batch(djb2_batch(chunk), w)
                rows += int(w.sum())
        yield _partial_batch(_task_partition_id(), rows, sk)

    return proj.mapInArrow(fold, PARTIAL_SCHEMA)


def merge_partials(partials_df, cfg: CMSConfig, *, depth: int | None = None) -> CountMinSketch:
    """Tree-merge serialized partials into one sketch (MPI_Reduce analog,
    src/mpi/mpiV2.c:163-175). treeReduce keeps every merge step bounded:
    with P partials and fan-in f, no single node touches more than f
    sketches — scalable to 10^5 input splits."""
    rdd = partials_df.select("sketch").rdd.map(lambda r: bytes(r[0]))
    n = max(rdd.getNumPartitions(), 2)
    tree_depth = depth if depth is not None else max(2, int(math.ceil(math.log(n, 16))))

    eps, delta = cfg.epsilon, cfg.delta

    def merge_bytes(x: bytes, y: bytes) -> bytes:
        a = CountMinSketch.from_bytes(x, eps, delta)
        b = CountMinSketch.from_bytes(y, eps, delta)
        return a.merge(b).to_bytes()

    blob = rdd.treeReduce(merge_bytes, depth=tree_depth)
    return CountMinSketch.from_bytes(blob, eps, delta)


def build_cms(df, item_col: str, cfg: CMSConfig, *, weight_col: str | None = None,
              string_items: bool = False) -> CountMinSketch:
    """End-to-end: partial sketches per partition -> tree merge -> sketch."""
    return merge_partials(
        cms_partials(df, item_col, cfg, weight_col=weight_col, string_items=string_items), cfg
    )


def build_cms_from_text(df, text_col: str, cfg: CMSConfig) -> CountMinSketch:
    return merge_partials(cms_text_partials(df, text_col, cfg), cfg)


# ---------------------------------------------------------------------------
# Per-group sketches (e.g. one CMS per lang / per host).
# Two-phase to stay skew-proof: phase 1 emits bounded per-(partition, group)
# partials; phase 2 shuffles only those small rows and merges per group —
# a hot group never concentrates raw rows on one task.
# ---------------------------------------------------------------------------
GROUPED_PARTIAL_SCHEMA = "group STRING, rows_seen LONG, total LONG, sketch BINARY"
_GROUPED_PA = pa.schema(
    [
        ("group", pa.string()),
        ("rows_seen", pa.int64()),
        ("total", pa.int64()),
        ("sketch", pa.binary()),
    ]
)


def iter_group_segments(batch: pa.RecordBatch, values: np.ndarray,
                        weights: np.ndarray | None = None):
    """Yield (group_key, value_slice, weight_slice_or_None) per distinct
    group of an Arrow batch whose column 0 holds the group key. Keys are
    dictionary-encoded so only UNIQUE key strings ever cross into Python;
    the segmenting argsort runs on int32 codes (matters for
    high-cardinality groups — host, file). Shared by the CMS grouped path
    and the generic sketch_agg grouped path."""
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(batch.column(0))
    codes = enc.indices.to_numpy(zero_copy_only=False)
    key_by_code = enc.dictionary.to_pylist()
    order = np.argsort(codes, kind="stable")
    sorted_codes = codes[order]
    sorted_values = values[order]
    sorted_w = weights[order] if weights is not None else None
    uniq, starts = np.unique(sorted_codes, return_index=True)
    bounds = np.append(starts, len(sorted_codes))
    for code, lo, hi in zip(uniq, bounds[:-1], bounds[1:]):
        yield (key_by_code[code], sorted_values[lo:hi],
               sorted_w[lo:hi] if sorted_w is not None else None)


def cms_grouped_partials(df, group_col: str, item_col: str, cfg: CMSConfig, *,
                         string_items: bool = False,
                         weight_col: str | None = None):
    cols = [group_col, item_col] + ([weight_col] if weight_col else [])
    proj = df.select(*cols)

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .sketch_agg import _weighted_update

        tune_allocator()
        sketches: dict[str, CountMinSketch] = {}
        counts: dict[str, int] = {}
        for batch in batches:
            if any(batch.column(i).null_count for i in range(batch.num_columns)):
                import pyarrow.compute as pc

                keep = pc.and_(batch.column(0).is_valid(), batch.column(1).is_valid())
                if weight_col:
                    keep = pc.and_(keep, batch.column(2).is_valid())
                batch = batch.filter(keep)
            if batch.num_rows == 0:
                continue
            items = _items_from_array(batch.column(1), string_items)
            w_all = (batch.column(2).to_numpy(zero_copy_only=False)
                     .astype(np.int64, copy=False) if weight_col else None)
            for g, seg, wseg in iter_group_segments(batch, items, w_all):
                sk = sketches.get(g)
                if sk is None:
                    sk = cfg.new_sketch()
                    sketches[g] = sk
                    counts[g] = 0
                counts[g] += _weighted_update(sk, seg, wseg)
        if sketches:
            yield pa.RecordBatch.from_pydict(
                {
                    "group": list(sketches.keys()),
                    "rows_seen": [counts[g] for g in sketches],
                    "total": [sketches[g].total for g in sketches],
                    "sketch": [sketches[g].to_bytes() for g in sketches],
                },
                schema=_GROUPED_PA,
            )

    return proj.mapInArrow(fold, GROUPED_PARTIAL_SCHEMA)


def cms_grouped(df, group_col: str, item_col: str, cfg: CMSConfig, *,
                string_items: bool = False, weight_col: str | None = None):
    """DataFrame[group, total, sketch]: one merged CMS per group value.
    ``weight_col`` feeds pre-aggregated (group, item, count) inputs through
    the native weighted CMS update — same dispatch as the ungrouped rail."""
    partials = cms_grouped_partials(df, group_col, item_col, cfg,
                                    string_items=string_items,
                                    weight_col=weight_col)
    eps, delta = cfg.epsilon, cfg.delta

    def merge_group(pdf):
        import pandas as pd

        merged = CountMinSketch.merge_blobs(pdf["sketch"], eps, delta)
        return pd.DataFrame(
            {
                "group": [pdf["group"].iloc[0]],
                "rows_seen": [int(pdf["rows_seen"].sum())],
                "total": [merged.total],
                "sketch": [merged.to_bytes()],
            }
        )

    return partials.groupBy("group").applyInPandas(merge_group, GROUPED_PARTIAL_SCHEMA)
