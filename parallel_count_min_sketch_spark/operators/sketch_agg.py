"""Generic mergeable-sketch aggregation over Spark.

Every kernel in ``sketches/`` implements the same protocol:
    update_batch(values) / merge(other) / to_bytes() / from_bytes(blob)
so one partial/final implementation serves CMS, HLL, Bloom, KLL and
t-digest alike (the north-star's "mergeable Arrow-vectorized aggregation"):
one serialized partial per partition via ``mapInArrow``, then an
associative tree merge. Element-wise-sum merges (CMS), max merges (HLL),
OR merges (Bloom) and compaction merges (KLL/t-digest) all ride the same
rails — only the kernel differs.
"""

from __future__ import annotations

import math
from typing import Callable, Iterator

import numpy as np
import pyarrow as pa

from ..memtune import tune_allocator
from ..sketches.hashing import djb2_batch
from ._grouped_fold import GroupedFoldBase, salted_pre_shuffle

PARTIAL_SCHEMA = "partition_id INT, rows_seen LONG, sketch BINARY"
_PARTIAL_PA = pa.schema(
    [("partition_id", pa.int32()), ("rows_seen", pa.int64()), ("sketch", pa.binary())]
)

_CHUNK = 1 << 17


def _task_partition_id() -> int:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    return ctx.partitionId() if ctx is not None else -1


def _weighted_update(sk, values: np.ndarray, weights: np.ndarray | None) -> int:
    """Dispatch a (values, weights) chunk by the kernel's WEIGHTED protocol:
      'native'    update_batch(values, weights) — CMS, t-digest
      'invariant' duplicates don't change the state (HLL, Bloom): weights
                  are dropped, which is EXACT for these kernels
      'repeat'    expand by repetition (KLL) — exact but O(sum(weights));
                  meant for modest pre-aggregated counts
    Zero-weight rows are dropped in EVERY mode (a count of 0 means the item
    never occurred — inserting it would corrupt HLL/Bloom); negative
    weights are rejected (they would break the CMS one-sided guarantee).
    Returns the logical row count consumed."""
    if weights is None:
        sk.update_batch(values)
        return len(values)
    if (weights < 0).any():
        raise ValueError("negative weights are not allowed in sketch builds")
    keep = weights > 0
    if not keep.all():
        values = values[keep]
        weights = weights[keep]
    if len(values) == 0:
        return 0
    mode = getattr(sk, "WEIGHTED", "repeat")
    if mode == "native":
        sk.update_batch(values, weights)
    elif mode == "invariant":
        sk.update_batch(values)
    else:
        _update_repeat_bounded(sk, values, weights)
    return int(weights.sum())


_REPEAT_CHUNK = 1 << 20  # cap any single np.repeat expansion (~8 MB int64)


def _update_repeat_bounded(sk, values: np.ndarray, weights: np.ndarray,
                           max_chunk: int = _REPEAT_CHUNK) -> None:
    """'repeat' weighted mode without unbounded allocation: pre-aggregated
    (item, count) inputs can carry counts whose sum is arbitrarily large,
    so np.repeat(values, weights) in one shot would allocate
    O(sum(weights)) elements. Expand in <=max_chunk slices instead —
    light rows grouped by running weight, heavy rows (weight >= max_chunk,
    rare by definition) streamed as repeats of a single reused buffer.

    Kernel contract: 'repeat'-mode update_batch must CONSUME its input (no
    retained references) — the heavy path feeds views of one reused
    mutable buffer, and every light chunk's array is freed right after the
    call. All in-tree kernels copy/fold their input (KLL buffers copies).
    """
    if int(weights.sum()) <= max_chunk:
        sk.update_batch(np.repeat(values, weights))
        return
    heavy = weights >= max_chunk
    if heavy.any():
        chunk = np.empty(max_chunk, dtype=values.dtype)  # one reused buffer
        for v, w in zip(values[heavy].tolist(), weights[heavy].tolist()):
            full, rem = divmod(int(w), max_chunk)
            chunk.fill(v)
            for _ in range(full):
                sk.update_batch(chunk)
            if rem:
                sk.update_batch(chunk[:rem])
        values, weights = values[~heavy], weights[~heavy]
    if len(values) == 0:
        return
    # group light rows into runs whose expanded size stays <= 2*max_chunk.
    # bins is NON-DECREASING (cumsum of non-negative weights), so each bin
    # is one contiguous run: slice by run bounds — O(n_rows) total — rather
    # than a boolean mask per bin, which is O(n_rows * n_bins) and blows up
    # when many rows carry weights just under max_chunk (one bin per row).
    bins = (np.cumsum(weights) - weights) // max_chunk
    _uniq, starts = np.unique(bins, return_index=True)
    bounds = np.append(starts, len(values))
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        sk.update_batch(np.repeat(values[lo:hi], weights[lo:hi]))


def sketch_partials(df, col: str, make_sketch: Callable, *,
                    weight_col: str | None = None,
                    string_items: bool = False, as_float: bool = False):
    """One serialized partial sketch per input partition. ``weight_col``
    feeds pre-aggregated ``(item, count)`` inputs — the common production
    shape — through the same rails (exactness per kernel documented in
    ``_weighted_update``)."""
    cols = [col] + ([weight_col] if weight_col else [])
    proj = df.select(*cols)

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tune_allocator()
        sk = make_sketch()
        rows = 0
        for batch in batches:
            c = batch.column(0)
            if c.null_count or (weight_col and batch.column(1).null_count):
                import pyarrow.compute as pc

                keep = c.is_valid()
                if weight_col:
                    # a null weight is "no occurrences", like SQL SUM —
                    # NOT int64(nan) garbage
                    keep = pc.and_(keep, batch.column(1).is_valid())
                batch = batch.filter(keep)
                c = batch.column(0)
            w_all = (
                batch.column(1).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                if weight_col
                else None
            )
            for lo in range(0, len(c), _CHUNK):
                chunk = c.slice(lo, _CHUNK)
                if string_items:
                    values = djb2_batch(chunk)
                elif as_float:
                    values = chunk.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
                else:
                    values = chunk.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                w = w_all[lo:lo + _CHUNK] if w_all is not None else None
                rows += _weighted_update(sk, values, w)
        yield pa.RecordBatch.from_pydict(
            {
                "partition_id": [_task_partition_id()],
                "rows_seen": [rows],
                "sketch": [sk.to_bytes()],
            },
            schema=_PARTIAL_PA,
        )

    return proj.mapInArrow(fold, PARTIAL_SCHEMA)


def merge_sketch_partials(partials_df, from_bytes: Callable, *, depth: int | None = None):
    """Associative tree merge of serialized partials (MPI_Reduce analog)."""
    rdd = partials_df.select("sketch").rdd.map(lambda r: bytes(r[0]))
    n = max(rdd.getNumPartitions(), 2)
    tree_depth = depth if depth is not None else max(2, int(math.ceil(math.log(n, 16))))

    def merge_bytes(x: bytes, y: bytes) -> bytes:
        return from_bytes(x).merge(from_bytes(y)).to_bytes()

    return from_bytes(rdd.treeReduce(merge_bytes, depth=tree_depth))


def build_sketch(df, col: str, make_sketch: Callable, from_bytes: Callable, *,
                 weight_col: str | None = None,
                 string_items: bool = False, as_float: bool = False):
    partials = sketch_partials(df, col, make_sketch, weight_col=weight_col,
                               string_items=string_items, as_float=as_float)
    return merge_sketch_partials(partials, from_bytes)


def text_token_partials(df, text_col: str, make_sketch: Callable, *,
                        sep: str = " "):
    """Kernel-generic doc-local token build: tokenize each Arrow batch in
    Arrow C kernels, collapse to (distinct token, count) with value_counts,
    djb2 ONCE per distinct token, and feed the kernel through the WEIGHTED
    protocol — no JVM-side explode, so the Arrow channel moves documents,
    not 100x as many single-token rows (measured 10x on the Misra-Gries
    build, BENCH/sketch_family_scale.json). Exact per kernel: 'native'
    kernels take the counts, 'invariant' ones (distinct/membership) drop
    them, 'repeat'-mode kernels expand bounded."""
    import pyarrow.compute as pc

    proj = df.select(text_col)

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tune_allocator()
        sk = make_sketch()
        rows = 0
        for batch in batches:
            col = batch.column(0)
            if col.null_count:
                col = col.drop_null()
            tokens = pc.list_flatten(pc.split_pattern(col, sep))
            if len(tokens):
                tokens = pc.filter(tokens, pc.not_equal(tokens, ""))
            if len(tokens) == 0:
                continue
            vc = pc.value_counts(tokens)
            vals = vc.field("values")
            counts = vc.field("counts").to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
            for lo in range(0, len(vals), _CHUNK):
                chunk = vals.slice(lo, _CHUNK)
                w = counts[lo:lo + _CHUNK]
                rows += _weighted_update(sk, djb2_batch(chunk), w)
        yield pa.RecordBatch.from_pydict(
            {
                "partition_id": [_task_partition_id()],
                "rows_seen": [rows],
                "sketch": [sk.to_bytes()],
            },
            schema=_PARTIAL_PA,
        )

    return proj.mapInArrow(fold, PARTIAL_SCHEMA)


def build_sketch_from_text(df, text_col: str, make_sketch: Callable,
                           from_bytes: Callable, *, sep: str = " "):
    partials = text_token_partials(df, text_col, make_sketch, sep=sep)
    return merge_sketch_partials(partials, from_bytes)


# ---------------------------------------------------------------------------
# Per-group sketches on the generic rails (one HLL per lang, one KLL per
# host, ...). Same two-phase, skew-proof shape as operators/agg.cms_grouped:
# phase 1 emits bounded per-(partition, group) partials; phase 2 shuffles
# only those small rows and merges per group.
# ---------------------------------------------------------------------------
GROUPED_SCHEMA = "group STRING, rows_seen LONG, sketch BINARY"
_GROUPED_PA = pa.schema(
    [("group", pa.string()), ("rows_seen", pa.int64()), ("sketch", pa.binary())]
)


def _emit_grouped_partials(sketches: dict, counts: dict):
    """The shared tail of every grouped partial builder: one RecordBatch
    of (group, rows_seen, sketch) rows for this partition — ONE copy of
    the emit contract, so a schema change lands in every builder."""
    if sketches:
        yield pa.RecordBatch.from_pydict(
            {
                "group": list(sketches.keys()),
                "rows_seen": [counts[g] for g in sketches],
                "sketch": [sketches[g].to_bytes() for g in sketches],
            },
            schema=_GROUPED_PA,
        )


class GroupedHLLFold(GroupedFoldBase):
    """Task-level grouped-HLL accumulator, vectorized ACROSS groups — the
    max-merge twin of ``agg.GroupedCMSFold``. One stacked (slot, m)
    register array for every group the task has seen; each Arrow batch
    folds in a single ``np.maximum.at`` scatter, so cost is O(rows)
    independent of group cardinality (the per-group-segment fold degrades
    to tiny numpy calls once groups-per-batch is large). Register values
    from the scatter are bit-identical to the per-sketch path: the same
    max lands in the same (slot, bucket) cell.

    Null filtering, the weighted protocol ('invariant': weights ignored
    for register state, summed into rows_seen) and the group->slot
    mapping live in the shared ``_grouped_fold.GroupedFoldBase``."""

    __slots__ = ("proto", "m", "_regs", "_rows")

    def __init__(self, precision: int, seed: int, *, string_items: bool = False,
                 weighted: bool = False):
        from ..sketches.hll import HyperLogLog

        super().__init__(string_items=string_items, weighted=weighted)
        self.proto = HyperLogLog(precision, seed)
        self.m = self.proto.m
        self._regs = np.zeros((0, self.m), dtype=np.int64)
        self._rows = np.zeros(0, dtype=np.int64)

    def _capacity(self) -> int:
        return self._regs.shape[0]

    def _grow(self, new_cap: int) -> None:
        cap = self._regs.shape[0]
        regs = np.zeros((new_cap, self.m), dtype=np.int64)
        regs[:cap] = self._regs
        self._regs = regs
        rows = np.zeros(new_cap, dtype=np.int64)
        rows[:cap] = self._rows
        self._rows = rows

    def _scatter(self, slots: np.ndarray, items: np.ndarray,
                 wts: np.ndarray | None) -> None:
        bucket, rho = self.proto._bucket_rho(items)
        np.maximum.at(self._regs.reshape(-1),
                      slots * np.int64(self.m) + bucket, rho)
        np.add.at(self._rows, slots, 1 if wts is None else wts)

    def result_batch(self) -> pa.RecordBatch | None:
        if not self._keys:
            return None
        from ..sketches.hll import HyperLogLog

        n = len(self._keys)
        blobs = [HyperLogLog(self.proto.precision, self.proto.seed,
                             registers=self._regs[s]).to_bytes()
                 for s in range(n)]
        return pa.RecordBatch.from_pydict(
            {"group": self._keys, "rows_seen": self._rows[:n].tolist(),
             "sketch": blobs},
            schema=_GROUPED_PA,
        )


def sketch_grouped_partials(df, group_col: str, col: str, make_sketch: Callable, *,
                            string_items: bool = False, as_float: bool = False,
                            weight_col: str | None = None):
    cols = [group_col, col] + ([weight_col] if weight_col else [])
    proj = df.select(*cols)

    sample = make_sketch()
    from ..sketches.hll import HyperLogLog

    if isinstance(sample, HyperLogLog) and not as_float:
        precision, seed = sample.precision, sample.seed
        weighted = weight_col is not None

        def fold_hll(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            tune_allocator()
            acc = GroupedHLLFold(precision, seed, string_items=string_items,
                                 weighted=weighted)
            for batch in batches:
                acc.update(batch)
            out = acc.result_batch()
            if out is not None:
                yield out

        return proj.mapInArrow(fold_hll, GROUPED_SCHEMA)

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        from .agg import iter_group_segments

        tune_allocator()
        sketches: dict[str, object] = {}
        counts: dict[str, int] = {}
        for batch in batches:
            if any(batch.column(i).null_count for i in range(batch.num_columns)):
                keep = pc.and_(batch.column(0).is_valid(), batch.column(1).is_valid())
                if weight_col:
                    keep = pc.and_(keep, batch.column(2).is_valid())
                batch = batch.filter(keep)
            if batch.num_rows == 0:
                continue
            vals_col = batch.column(1)
            if string_items:
                values = djb2_batch(vals_col)
            elif as_float:
                values = vals_col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            else:
                values = vals_col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            w_all = (batch.column(2).to_numpy(zero_copy_only=False)
                     .astype(np.int64, copy=False) if weight_col else None)
            for g, seg, wseg in iter_group_segments(batch, values, w_all):
                sk = sketches.get(g)
                if sk is None:
                    sk = make_sketch()
                    sketches[g] = sk
                    counts[g] = 0
                counts[g] += _weighted_update(sk, seg, wseg)
        yield from _emit_grouped_partials(sketches, counts)

    return proj.mapInArrow(fold, GROUPED_SCHEMA)


def merge_grouped_partials(partials, from_bytes: Callable):
    """Phase 2 of every grouped build: shuffle only the small
    (partition, group) partial rows and merge per group."""

    def merge_group(pdf):
        import pandas as pd

        out = None
        for blob in pdf["sketch"]:
            sk = from_bytes(bytes(blob))
            out = sk if out is None else out.merge(sk)
        return pd.DataFrame(
            {
                "group": [pdf["group"].iloc[0]],
                "rows_seen": [int(pdf["rows_seen"].sum())],
                "sketch": [out.to_bytes()],
            }
        )

    return partials.groupBy("group").applyInPandas(merge_group, GROUPED_SCHEMA)


def sketch_grouped(df, group_col: str, col: str, make_sketch: Callable,
                   from_bytes: Callable, *, string_items: bool = False,
                   as_float: bool = False, weight_col: str | None = None,
                   pre_shuffle_salt: int | None = None,
                   n_partitions: int | None = None,
                   salt_seed: int = 0):
    """DataFrame[group, rows_seen, sketch]: one merged sketch per group.
    ``weight_col`` feeds pre-aggregated (group, item, count) inputs through
    the per-kernel WEIGHTED dispatch (``_weighted_update``).

    ``pre_shuffle_salt=s``: one raw-row shuffle on hash(group, item-salt%s)
    before phase 1 — use at HIGH group cardinality, where otherwise every
    scan partition emits a partial for every group and phase-2 shuffle
    volume is partitions x groups x blob bytes; salting caps it at
    groups x s while splitting hot groups over s tasks (same trade-off as
    ``agg.cms_grouped``, measured in BENCH/grouped_skew.json). CMS/HLL/
    Bloom/KMV merge to identical state under any partitioning; KLL and
    t-digest state depends on how rows were grouped into partials
    (randomized compaction / centroid order), but their published error
    bounds hold regardless — same caveat as any repartition."""
    src = df
    if pre_shuffle_salt:
        src = salted_pre_shuffle(df, group_col, col, pre_shuffle_salt,
                                 n_partitions, salt_seed)
    partials = sketch_grouped_partials(src, group_col, col, make_sketch,
                                       string_items=string_items,
                                       as_float=as_float, weight_col=weight_col)
    return merge_grouped_partials(partials, from_bytes)


def text_token_grouped_partials(df, group_col: str, text_col: str,
                                make_sketch: Callable, *, sep: str = " "):
    """Doc-local GROUPED token build: one partial sketch per
    (partition, group) over a text column, tokenizing inside Arrow C
    kernels — the grouped sibling of :func:`text_token_partials`. The
    Arrow channel moves (group, document) rows, never the exploded token
    stream; per batch each group's texts are segmented once
    (dictionary-coded argsort via ``iter_group_segments``), tokenized,
    collapsed with value_counts, djb2-hashed once per distinct token and
    fed through the WEIGHTED protocol."""
    import pyarrow.compute as pc

    proj = df.select(group_col, text_col)

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .agg import iter_group_segments

        tune_allocator()
        sketches: dict[str, object] = {}
        counts: dict[str, int] = {}
        for batch in batches:
            if batch.column(0).null_count or batch.column(1).null_count:
                keep = pc.and_(batch.column(0).is_valid(),
                               batch.column(1).is_valid())
                batch = batch.filter(keep)
            if batch.num_rows == 0:
                continue
            text = batch.column(1)
            row_idx = np.arange(batch.num_rows, dtype=np.int64)
            for g, seg_idx, _w in iter_group_segments(batch, row_idx):
                texts = pc.take(text, pa.array(seg_idx, type=pa.int64()))
                tokens = pc.list_flatten(pc.split_pattern(texts, sep))
                if len(tokens):
                    tokens = pc.filter(tokens, pc.not_equal(tokens, ""))
                if len(tokens) == 0:
                    continue
                vc = pc.value_counts(tokens)
                vals = vc.field("values")
                w = vc.field("counts").to_numpy(zero_copy_only=False) \
                    .astype(np.int64, copy=False)
                sk = sketches.get(g)
                if sk is None:
                    sk = make_sketch()
                    sketches[g] = sk
                    counts[g] = 0
                for lo in range(0, len(vals), _CHUNK):
                    counts[g] += _weighted_update(
                        sk, djb2_batch(vals.slice(lo, _CHUNK)),
                        w[lo:lo + _CHUNK])
        yield from _emit_grouped_partials(sketches, counts)

    return proj.mapInArrow(fold, GROUPED_SCHEMA)


def sketch_grouped_from_text(df, group_col: str, text_col: str,
                             make_sketch: Callable, from_bytes: Callable, *,
                             sep: str = " "):
    partials = text_token_grouped_partials(df, group_col, text_col,
                                           make_sketch, sep=sep)
    return merge_grouped_partials(partials, from_bytes)


def finalize_grouped(grouped_df, finalize_fn, out_schema: str,
                     out_pa_schema: pa.Schema):
    """Executor-side finalization of a grouped-sketch DataFrame: decode and
    probe each group's serialized sketch INSIDE ``mapInArrow`` and emit the
    result columns — zero sketch bytes ever reach the driver. At 10k+
    groups (per-host / per-domain sketches) the driver-side
    ``collect()`` + decode loop this replaces would pull gigabytes of blobs
    and serialize all estimate math on one process.

    ``finalize_fn(row: dict) -> list[tuple]`` is called once per group row
    (binary columns arrive as ``bytes``) and returns zero or more output
    tuples matching ``out_schema`` — probes may be row-expanding (e.g. one
    row per quantile)."""
    names = [f.name for f in out_pa_schema]

    def fin(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tune_allocator()
        for batch in batches:
            rows: list[tuple] = []
            for row in batch.to_pylist():
                rows.extend(finalize_fn(row))
            if rows:
                yield pa.RecordBatch.from_pydict(
                    {n: [r[i] for r in rows] for i, n in enumerate(names)},
                    schema=out_pa_schema,
                )

    return grouped_df.mapInArrow(fin, out_schema)
