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

PARTIAL_SCHEMA = "partition_id INT, rows_seen LONG, sketch BINARY"
_PARTIAL_PA = pa.schema(
    [("partition_id", pa.int32()), ("rows_seen", pa.int64()), ("sketch", pa.binary())]
)

_CHUNK = 1 << 17


def _task_partition_id() -> int:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    return ctx.partitionId() if ctx is not None else -1


def sketch_partials(df, col: str, make_sketch: Callable, *,
                    string_items: bool = False, as_float: bool = False):
    """One serialized partial sketch per input partition."""
    proj = df.select(col)

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tune_allocator()
        sk = make_sketch()
        rows = 0
        for batch in batches:
            c = batch.column(0)
            if c.null_count:
                c = c.drop_null()
            for lo in range(0, len(c), _CHUNK):
                chunk = c.slice(lo, _CHUNK)
                if string_items:
                    values = djb2_batch(chunk)
                elif as_float:
                    values = chunk.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
                else:
                    values = chunk.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                sk.update_batch(values)
                rows += len(values)
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
                 string_items: bool = False, as_float: bool = False):
    partials = sketch_partials(df, col, make_sketch,
                               string_items=string_items, as_float=as_float)
    return merge_sketch_partials(partials, from_bytes)
