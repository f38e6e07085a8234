"""Bucketed table layout: pre-shuffle a fact table ONCE at write time so
every later key-join and key-aggregation reads it co-located — zero
exchange at query time.

This is the storage-side lever for the repeated-join workloads a
training pipeline runs daily (events↔users, docs↔scores, shard↔shard
dedup): `bucketBy(n, key)` hash-partitions files by key and records the
layout in the catalog; a join of two tables bucketed on the same key
with the same bucket count executes as a SortMergeJoin with NO Exchange
on either side (gated in tests/test_bucketing.py), and `sortBy` inside
buckets lets the SMJ skip its sort. At 100 TB this converts the
biggest recurring shuffle a pipeline pays into a one-time write cost.

Spark only honors bucket layouts through the catalog (`saveAsTable` /
`spark.table`) — a bare `.parquet(path)` write silently loses them —
so this module wraps the table-backed form with an explicit external
path (no warehouse-dir surprises).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   n_buckets: int, *, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as an EXTERNAL bucketed parquet table at ``path``,
    registered in the session catalog as ``table``. Joins between tables
    bucketed on the same key with the same ``n_buckets`` are
    exchange-free. ``sort=True`` additionally sorts within buckets on the
    key so downstream SortMergeJoins skip their sort stage."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be > 0, got {n_buckets}")
    w = df.write.mode(mode).format("parquet") \
        .bucketBy(n_buckets, key).option("path", path)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the ONLY read path that preserves the bucket
    layout (spark.read.parquet(path) on the same files would re-plan
    exchanges)."""
    return spark.table(table)
