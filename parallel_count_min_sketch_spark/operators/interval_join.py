"""Interval (time-range) join: pair left rows with right rows of the same
key whose timestamps fall within ±window of the left timestamp.

The naive expression (`l.key = r.key AND abs(r.ts - l.ts) <= w`) gives
Catalyst only an equi-part on key; with a skewed or low-cardinality key the
range predicate ends up evaluated row-by-row inside one huge join task —
or, with no usable equi-part at all, the plan degenerates to
BroadcastNestedLoopJoin. This operator makes the join an EQUI-join on
(key, time_bucket): the right side lands in exactly one bucket of width
``bucket_us``; the left side explodes to the few buckets its ±window can
overlap (2w/b + 1 rows, 3 at the default b = w); the exact predicate then
filters the bucket-collocated candidates. Shuffle keys are (key, bucket),
so time spreads one hot key across many partitions — the same salting
effect operators/skew.py applies to plain aggregations.

Beyond-reference training-data operator (the reference joins nothing);
the shape is the standard bucketized range-join used by Spark range-join
hints and interval libraries, re-expressed with public DataFrame ops.

Scale notes (100 TB): left is duplicated (2w/b + 1)×, so pick
``bucket_us`` ≈ the window for a 3× fan-out; both sides shuffle once on
(key, bucket); the exact filter runs inside whole-stage codegen before
anything wide happens. No BroadcastNestedLoopJoin appears at any size
(gated in tests/test_plan_quality.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["interval_join"]


def _epoch_us_sql(df: DataFrame, ts_col: str) -> str:
    """SQL expression for tz-independent epoch microseconds of ``ts_col``.

    TIMESTAMP_NTZ has no unix_micros; diffing against the naive epoch
    literal is exact and timezone-free (same trick as the sessionization
    query), matching DuckDB's epoch_us on a naive timestamp. Plain
    TIMESTAMP keeps unix_micros."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return (f"timestampdiff(MICROSECOND,"
                f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})")
    return f"unix_micros({ts_col})"


def interval_join(left: DataFrame, right: DataFrame, key_col: str,
                  left_ts_col: str, right_ts_col: str, *,
                  window_us: int, bucket_us: int | None = None) -> DataFrame:
    """All (left, right) pairs with equal ``key_col`` and
    ``|right_ts - left_ts| <= window_us`` (inclusive both ends).

    ``left_ts_col`` / ``right_ts_col`` are timestamp columns; every other
    column of both inputs is carried through, so callers must ensure the
    non-key column names don't collide (rename before the call, as with
    any Spark join). Rows with a NULL key or NULL timestamp never match,
    matching the SQL inequality-join semantics the DuckDB oracle uses.

    ``bucket_us`` (default: ``window_us``) is the bucket width; smaller
    buckets duplicate the left side more (2w/b + 1 copies) but tighten
    the candidate set. ``left_ts - window_us`` must be non-negative —
    i.e. post-1970 timestamps with sane windows — because `div`
    truncates toward zero, which equals floor only for non-negative
    operands.
    """
    if window_us < 0:
        raise ValueError(f"window_us must be >= 0, got {window_us}")
    b = int(bucket_us) if bucket_us is not None else int(window_us)
    if b <= 0:
        raise ValueError(f"bucket_us must be > 0, got {b}")
    w = int(window_us)

    lus = _epoch_us_sql(left, left_ts_col)
    rus = _epoch_us_sql(right, right_ts_col)
    lt = F.expr(lus)
    rt = F.expr(rus)
    # integer-exact bucket arithmetic, no double division
    lo = F.expr(f"({lus} - {w}) div {b}")
    hi = F.expr(f"({lus} + {w}) div {b}")
    L = left.withColumn("_bucket", F.explode(F.sequence(lo, hi)))
    R = right.withColumn("_bucket", F.expr(f"({rus}) div {b}"))
    return (
        L.join(R, on=[key_col, "_bucket"])
        .filter(F.abs(rt - lt) <= F.lit(w))
        .drop("_bucket")
    )
