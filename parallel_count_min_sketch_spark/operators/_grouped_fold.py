"""Shared scaffolding for the stacked (vectorized-across-groups) grouped
fold accumulators — ``agg.GroupedCMSFold`` (scatter-add counters) and
``sketch_agg.GroupedHLLFold`` (scatter-max registers) differ ONLY in their
per-batch scatter; everything around it (null filtering, the weighted
protocol, dictionary-encode -> slot mapping, geometric capacity growth,
item extraction) is this base class, so a protocol fix lands in exactly
one place.

Weighted protocol (both kernels): negative weights rejected loudly,
zero-weight rows dropped BEFORE item extraction (for string items the
djb2 byte fold is the most expensive per-row step and pre-aggregated
inputs can carry many zero-count rows). What surviving weights MEAN is
the subclass's business: CMS adds them into counters ('native'), HLL
ignores them for register state ('invariant') — both fold them into the
per-group row totals.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketches.hashing import djb2_batch


def items_from_array(col: pa.Array, string_items: bool) -> np.ndarray:
    """int64 item ids from an Arrow column: djb2 byte fold for strings
    (reference hash), plain int64 view otherwise."""
    if string_items:
        return djb2_batch(col)
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


class GroupedFoldBase:
    """Task-level grouped accumulator core. Subclasses provide:

    - ``_capacity()``: current slot capacity of their stacked arrays
    - ``_grow(new_cap)``: reallocate those arrays to ``new_cap`` slots
    - ``_scatter(slots, items, wts)``: fold one batch's rows (``wts`` is
      None for unweighted inputs; zero/negative weights never reach it)
    """

    __slots__ = ("string_items", "weighted", "_slot", "_keys")

    def __init__(self, *, string_items: bool = False, weighted: bool = False):
        self.string_items = string_items
        self.weighted = weighted
        self._slot: dict = {}
        self._keys: list = []

    # -- subclass surface ----------------------------------------------------
    def _capacity(self) -> int:
        raise NotImplementedError

    def _grow(self, new_cap: int) -> None:
        raise NotImplementedError

    def _scatter(self, slots: np.ndarray, items: np.ndarray,
                 wts: np.ndarray | None) -> None:
        raise NotImplementedError

    # -- shared fold ----------------------------------------------------------
    def _ensure_capacity(self, n: int) -> None:
        cap = self._capacity()
        if n > cap:
            self._grow(max(n, cap * 2, 16))

    def update(self, batch: pa.RecordBatch) -> None:
        """Fold one Arrow batch of (group, item[, weight]) rows."""
        import pyarrow.compute as pc

        if any(batch.column(i).null_count for i in range(batch.num_columns)):
            keep = pc.and_(batch.column(0).is_valid(),
                           batch.column(1).is_valid())
            if self.weighted:
                keep = pc.and_(keep, batch.column(2).is_valid())
            batch = batch.filter(keep)
        if batch.num_rows == 0:
            return
        if self.weighted:
            wts = (batch.column(2).to_numpy(zero_copy_only=False)
                   .astype(np.int64, copy=False))
            if (wts < 0).any():
                raise ValueError(
                    "negative weights are not allowed in sketch builds")
            keep_w = wts > 0
            if not keep_w.all():
                wts = wts[keep_w]
                batch = batch.filter(pa.array(keep_w))
            if batch.num_rows == 0:
                return
        else:
            wts = None
        items = items_from_array(batch.column(1), self.string_items)

        # only UNIQUE group strings cross into Python; rows map to slots
        # through a numpy gather over the dictionary codes
        enc = pc.dictionary_encode(batch.column(0))
        codes = (enc.indices.to_numpy(zero_copy_only=False)
                 .astype(np.int64, copy=False))
        uniq = enc.dictionary.to_pylist()
        slot_of = self._slot
        keys = self._keys
        code_slot = np.empty(len(uniq), dtype=np.int64)
        for i, g in enumerate(uniq):
            s = slot_of.get(g)
            if s is None:
                s = len(keys)
                slot_of[g] = s
                keys.append(g)
            code_slot[i] = s
        self._ensure_capacity(len(keys))
        self._scatter(code_slot[codes], items, wts)


def salted_pre_shuffle(df, group_col: str, col: str, salt: int,
                       n_partitions: int | None, salt_seed: int):
    """One raw-row repartition on hash(group, item-salt % s) — the shared
    pre-shuffle of the salted grouped builds (``agg.cms_grouped`` /
    ``sketch_agg.sketch_grouped``): caps per-group partials at ``salt``
    per group instead of one per scan partition, while splitting hot
    groups over ``salt`` tasks (measured in BENCH/grouped_skew.json)."""
    from pyspark.sql import functions as F

    salt_col = F.pmod(F.xxhash64(F.col(col), F.lit(int(salt_seed))),
                      F.lit(int(salt)))
    keys = [F.col(group_col), salt_col]
    return (df.repartition(n_partitions, *keys) if n_partitions
            else df.repartition(*keys))
