"""Custom stateful streaming operator: per-group CMS maintained in Spark's
keyed state store via applyInPandasWithState.

Unlike the foreachBatch accumulator (stream_cms.py) — where the driver owns
one global sketch — this keeps one sketch PER GROUP inside Spark's state
store: distributed, fault-tolerant through the checkpoint, and scalable to
arbitrarily many groups. Each trigger folds the group's new rows into its
sketch (vectorized kernel, no per-row Python) and emits the updated
(group, total_mass, sketch) row.

Restart note (verified): state recovery across a query restart requires a
checkpoint-recoverable sink (foreachBatch / file / kafka). The memory sink
refuses recovery ("This query does not support recovering from checkpoint
location") — use it only for single-run tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from ..config import CMSConfig
from ..sketches.cms import CountMinSketch
from ..sketches.hashing import djb2_batch

OUTPUT_SCHEMA = "group STRING, rows_in_batch BIGINT, total_mass BIGINT, sketch BINARY"
STATE_SCHEMA = "sketch BINARY"


def stateful_grouped_cms(stream_df, group_col: str, text_col: str, cfg: CMSConfig):
    """streaming DataFrame -> per-group updated sketches each trigger.

    Usage:
        out = stateful_grouped_cms(stream, "lang", "text", cfg)
        out.writeStream.outputMode("update")...
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    eps, delta, seed = cfg.epsilon, cfg.delta, cfg.seed

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        from ..memtune import tune_allocator

        tune_allocator()
        local_cfg = CMSConfig(eps, delta, seed)
        if state.exists:
            (blob,) = state.get
            sk = CountMinSketch.from_bytes(bytes(blob), eps, delta)
        else:
            sk = local_cfg.new_sketch()
        rows = 0
        for pdf in pdfs:
            texts = pdf[text_col].dropna()
            if len(texts):
                # tokenize in Arrow C kernels (split + flatten + filter),
                # same hot path as operators/agg.cms_text_partials — no
                # Python-level string concat or per-token loop
                import pyarrow as pa
                import pyarrow.compute as pc

                tokens = pc.list_flatten(
                    pc.split_pattern(pa.array(texts, type=pa.string()), " ")
                )
                if len(tokens):
                    tokens = pc.filter(tokens, pc.not_equal(tokens, ""))
                if len(tokens):
                    sk.update_batch(djb2_batch(tokens))
                    rows += len(tokens)
        state.update((sk.to_bytes(),))
        yield pd.DataFrame(
            {
                "group": [key[0]],
                "rows_in_batch": [rows],
                "total_mass": [sk.total],
                "sketch": [sk.to_bytes()],
            }
        )

    return (
        stream_df.groupBy(group_col)
        .applyInPandasWithState(
            update, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def stateful_grouped_sketch(stream_df, group_col: str, text_col: str,
                            make_sketch, from_bytes):
    """Kernel-generic sibling of :func:`stateful_grouped_cms`: one
    mergeable sketch of ANY family (Misra-Gries frequent items, HLL
    distinct, KLL quantiles, ...) per group in Spark's keyed state store.
    Each trigger tokenizes the group's new rows doc-locally (Arrow C
    kernels + value_counts, same hot path as the batch builds), feeds the
    kernel through its WEIGHTED protocol, and emits the updated state.
    ``make_sketch`` / ``from_bytes`` must pickle by reference (partials /
    module-level wrappers, same rule as the batch rails)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.sketch_agg import _weighted_update

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        from ..memtune import tune_allocator

        tune_allocator()
        if state.exists:
            (blob,) = state.get
            sk = from_bytes(bytes(blob))
        else:
            sk = make_sketch()
        rows = 0
        for pdf in pdfs:
            texts = pdf[text_col].dropna()
            if len(texts):
                import numpy as np
                import pyarrow as pa
                import pyarrow.compute as pc

                tokens = pc.list_flatten(
                    pc.split_pattern(pa.array(texts, type=pa.string()), " ")
                )
                if len(tokens):
                    tokens = pc.filter(tokens, pc.not_equal(tokens, ""))
                if len(tokens):
                    vc = pc.value_counts(tokens)
                    w = vc.field("counts").to_numpy(zero_copy_only=False) \
                        .astype(np.int64, copy=False)
                    rows += _weighted_update(
                        sk, djb2_batch(vc.field("values")), w)
        state.update((sk.to_bytes(),))
        yield pd.DataFrame(
            {
                "group": [key[0]],
                "rows_in_batch": [rows],
                "total_mass": [getattr(sk, "n_total", rows)],
                "sketch": [sk.to_bytes()],
            }
        )

    return (
        stream_df.groupBy(group_col)
        .applyInPandasWithState(
            update, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
            GroupStateTimeout.NoTimeout,
        )
    )
