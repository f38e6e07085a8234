"""Loaders for the driver-provided parquet tables.

At 100 TB the source would be an Iceberg catalog table; here it's plain
parquet. Either way the scan is splittable and column-pruned by Catalyst —
always select only needed columns so the `html`/`text`-sized blobs are
pruned out of sketch-only scans (SURVEY §7 hard part (e))."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(name)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
