"""Integer item stream — the reference's exact input shape (uint32 items,
one per 'line'; scripts/gen_datasets.py mixture, seed 12345):
10% item 123, 10% item 456, 10% uniform [100,110], 70% uniform [1000,9999].

Generated entirely JVM-side from spark.range with the seeded affine PRNG —
a pure function of (seed, n), splittable, no I/O. Used for the
reference-parity benchmark (BASELINE.md builds over 250M/500M/1000M of
exactly these items).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sketches.hashing import MERSENNE_PRIME


def _u(expr: str, salt: int, seed: int) -> str:
    a = 1_103_515_245 + 2 * salt
    b = (12_345 + seed * 1_000_003 + salt * 7_919) % MERSENNE_PRIME
    return f"((({a} * (({expr}) % {MERSENNE_PRIME}) + {b}) % {MERSENNE_PRIME}))"


def items_df(spark: SparkSession, n: int, *, seed: int = 12345,
             partitions: int | None = None) -> DataFrame:
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    r = f"(CAST({_u('id', 1, seed)} AS DOUBLE) / {MERSENNE_PRIME}.0)"
    v = _u("id", 2, seed)
    item = (
        f"CASE WHEN {r} < 0.1 THEN CAST(123 AS BIGINT) "
        f"WHEN {r} < 0.2 THEN CAST(456 AS BIGINT) "
        f"WHEN {r} < 0.3 THEN CAST(100 + ({v} % 11) AS BIGINT) "
        f"ELSE CAST(1000 + ({v} % 9000) AS BIGINT) END"
    )
    return df.select(F.expr(item).alias("item"))
