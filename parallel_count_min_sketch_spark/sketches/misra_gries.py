"""Misra-Gries mergeable frequent-items summary (north-star addition).

A deterministic, hash-free heavy-hitter family complementing the CMS
path (SURVEY §2: the reference's only frequency operator is the CMS,
src/serial/cms.c — this is the classic alternative with an L1
guarantee and a hard capacity bound instead of probabilistic width).

State: at most k (item, count) pairs of int64. Invariant after every
update/merge (Misra & Gries 1982; mergeability per Agarwal, Cormode,
Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS 2012):

    true_count(x) - decrements <= est(x) <= true_count(x)

where ``decrements`` (tracked exactly in ``offset_total``) is at most
n/(k+1) over any stream of n items. Hence every item with true count
> n/(k+1) is guaranteed present in the summary — the candidate-set
property the distributed top-N recovery relies on.

Batch update is vectorized: group-sum the incoming chunk with
np.unique, concatenate with the current pairs, group-sum again, and if
more than k keys remain subtract the (k+1)-th largest count from all
and drop the non-positive ones (the standard mergeable reduction — one
O(m log m) pass, no per-item loop). Merge = the same reduction over
the concatenated pair sets, associative up to the invariant (estimates
from differently-ordered merges differ, but all satisfy the bound and
all retain every > n/(k+1) item, which is what the exact-recount
contract query consumes).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"MGS1"
_HEADER = struct.Struct("<4sIqq")  # magic, k, n_total, offset_total


def _reduce(items: np.ndarray, counts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Group-sum (items, counts), then shrink to <= k keys by the
    subtract-(k+1)th-largest rule. Returns (items, counts, decrement)."""
    items, inv = np.unique(items, return_inverse=True)
    sums = np.zeros(len(items), dtype=np.int64)
    np.add.at(sums, inv, counts)  # exact int64 group-sum (no float round-trip)
    counts = sums
    if len(items) <= k:
        return items, counts, 0
    # (k+1)-th largest count = the amount to subtract everywhere
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    counts = counts - kth
    keep = counts > 0
    return items[keep], counts[keep], int(kth)


class MisraGries:
    WEIGHTED = "native"  # update_batch takes (values, counts) exactly
    __slots__ = ("k", "items", "counts", "n_total", "offset_total")

    def __init__(self, k: int = 1024, *, items: np.ndarray | None = None,
                 counts: np.ndarray | None = None, n_total: int = 0,
                 offset_total: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.items = np.empty(0, dtype=np.int64) if items is None else np.asarray(items, dtype=np.int64)
        self.counts = np.empty(0, dtype=np.int64) if counts is None else np.asarray(counts, dtype=np.int64)
        self.n_total = int(n_total)          # stream length consumed
        self.offset_total = int(offset_total)  # exact sum of decrements

    def config_key(self):
        return (self.k,)

    def update_batch(self, values, weights=None) -> None:
        values = np.asarray(values, dtype=np.int64)
        if values.size == 0:
            return
        w = (np.ones(len(values), dtype=np.int64) if weights is None
             else np.asarray(weights, dtype=np.int64))
        self.n_total += int(w.sum())
        items = np.concatenate([self.items, values])
        counts = np.concatenate([self.counts, w])
        self.items, self.counts, dec = _reduce(items, counts, self.k)
        self.offset_total += dec

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.config_key() != other.config_key():
            raise ValueError("incompatible Misra-Gries configs")
        items = np.concatenate([self.items, other.items])
        counts = np.concatenate([self.counts, other.counts])
        self.items, self.counts, dec = _reduce(items, counts, self.k)
        self.n_total += other.n_total
        self.offset_total += other.offset_total + dec
        return self

    def copy_empty(self) -> "MisraGries":
        return MisraGries(self.k)

    def estimate(self, values) -> np.ndarray:
        """Lower-bound estimate per queried value (0 if absent). True
        count is within [est, est + offset_total]."""
        values = np.asarray(values, dtype=np.int64)
        pos = np.searchsorted(self.items, values)
        pos = np.clip(pos, 0, max(len(self.items) - 1, 0))
        out = np.zeros(len(values), dtype=np.int64)
        if len(self.items):
            hit = self.items[pos] == values
            out[hit] = self.counts[pos[hit]]
        return out

    def error_bound(self) -> int:
        """Exact max underestimate of any item's count (sum of decrements
        actually applied — always <= n_total // (k+1))."""
        return self.offset_total

    def candidates(self) -> np.ndarray:
        """Every item whose true count could exceed offset_total — i.e.
        the full kept set (contains all items with count > n/(k+1))."""
        return self.items.copy()

    def to_bytes(self) -> bytes:
        head = _HEADER.pack(_MAGIC, self.k, self.n_total, self.offset_total)
        return head + self.items.tobytes() + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "MisraGries":
        magic, k, n_total, offset_total = _HEADER.unpack_from(data, 0)
        if magic != _MAGIC:
            raise ValueError("not a MGS1 blob")
        body = np.frombuffer(data, dtype=np.int64, offset=_HEADER.size)
        m = len(body) // 2
        return cls(k, items=body[:m].copy(), counts=body[m:].copy(),
                   n_total=n_total, offset_total=offset_total)
