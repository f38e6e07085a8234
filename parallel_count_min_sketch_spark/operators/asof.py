"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For each left row, attach the right row with the greatest timestamp
<= the left row's timestamp, per key ("the most recent quote before
this trade", "the last purchase before this click"). The naive
formulation is a range join (left.ts >= right.ts) + per-left argmax —
a cross-product blowup Catalyst plans as BroadcastNestedLoopJoin.

This implementation is the scalable union-merge form: tag both sides,
union them, and run ONE window per key ordered by (ts, side) carrying
the right side's columns forward with last(..., ignorenulls=True).
Cost: a single hash shuffle on the key + a per-key sort — the same
price as a regular join, with zero range explosion. (Same algorithm
pandas.merge_asof uses after its sort, and what Flink's temporal join
does with state; the DuckDB oracle replays it with its native
ASOF JOIN.)

Semantics: match on right.ts <= left.ts (ASOF >=, the DuckDB default).
Rows at equal timestamps match (the right row sorts first via the side
tag). If the right side can hold several rows per (key, ts), pass
``tiebreak_col`` to make the carried row deterministic (the greatest
tiebreak value wins); without ties the column is unnecessary.

Nulls: left rows with no earlier right row get NULL in every carried
column (left-outer semantics). NULL keys/timestamps never match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key_col: str, ts_col: str,
              value_cols: list[str], *, prefix: str = "asof_",
              tiebreak_col: str | None = None) -> DataFrame:
    """Left as-of join. Returns ``left``'s columns plus
    ``{prefix}{c}`` for each c in ``value_cols`` (NULL when no right row
    precedes the left row for that key)."""
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    carried = [f"{prefix}{c}" for c in value_cols]
    # the carried values travel as ONE struct: a right row's payload is
    # non-NULL even when every value inside it is NULL, so (a) a matched
    # row with NULL values yields NULLs (not a stale older value — the
    # ignorenulls carry must skip only MISSING payloads, never NULL
    # fields) and (b) multi-column carries can never mix fields from
    # different right rows (the struct is atomic)
    r_sel = [F.col(key_col), F.col(ts_col),
             F.struct(*[F.col(c).alias(f"{prefix}{c}") for c in value_cols])
             .alias("_asof_payload")]
    if tiebreak_col:
        r_sel.append(F.col(tiebreak_col).alias("_asof_tb"))
    # enforce the documented contract: NULL keys/timestamps never match.
    # Without this filter a NULL-ts right row sorts FIRST (asc nulls
    # first) and its payload would be carried to left rows with no true
    # earlier match, and NULL-key rows co-partition so NULL-key left rows
    # would match NULL-key right rows — both diverge from ASOF semantics.
    right_clean = right.filter(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    r = right_clean.select(*r_sel).withColumn("_asof_side", F.lit(0))
    l_tagged = left.withColumn("_asof_side", F.lit(1))
    both = l_tagged.unionByName(r, allowMissingColumns=True)

    # (ts, side[, tiebreak]): right rows (side 0) sort BEFORE left rows at
    # an equal timestamp — that IS the >= match; among right rows at one
    # (key, ts) the greatest tiebreak sorts last, so last(...) carries it
    order = [F.col(ts_col).asc(), F.col("_asof_side").asc()]
    if tiebreak_col:
        order.append(F.col("_asof_tb").asc_nulls_first())
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = both.withColumn(
        "_asof_payload", F.last("_asof_payload", ignorenulls=True).over(w))
    # one projection instead of a withColumn per carried column (each
    # withColumn call costs ~20 ms of construction): same replace-in-
    # place-or-append semantics as the loop it replaces
    cset = set(carried)
    existing = set(out.columns)
    cols = [F.col(f"_asof_payload.{c}").alias(c) if c in cset else F.col(c)
            for c in out.columns]
    cols += [F.col(f"_asof_payload.{c}").alias(c)
             for c in carried if c not in existing]
    out = out.select(*cols)
    drop = ["_asof_side", "_asof_payload"] + (["_asof_tb"] if tiebreak_col else [])
    return out.filter(F.col("_asof_side") == 1).drop(*drop)
