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


# Memo of the ANALYZED TABLE RELATION per (session, dir, table) — a lazy
# plan handle, the same immutable object a long-lived application would
# hold in a variable. Nothing is computed or cached data-side: every
# action on the returned DataFrame still plans against the live session
# conf and scans the parquet. What this skips is re-resolving the
# relation (DataSource resolution + schema read + py4j round-trips,
# measured 70-150 ms per call from the driver) on every query
# construction — driver overhead per guide §5, not result caching.
_LOAD_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(name)
    import os as _os

    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir), name)
    df = _LOAD_MEMO.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _LOAD_MEMO[key] = df
    return df


# Upper bound on the table size the parallelism floor may shuffle: past
# this the scan produces plenty of splits anyway and a round-robin
# repartition would move real data volume for nothing.
SPREAD_MAX_BYTES = 4 << 30
# Lower bound: below this the per-partition work is too small for the
# extra exchange to pay for itself (measured at sf0.1: the 0.6 MB
# documents table LOST 1.2-1.7x with the floor, while the 5.7 MB sf1.0
# table won 2-6x — the knee sits between those).
SPREAD_MIN_BYTES = 4 << 20


def _table_bytes(sf_dir: str, name: str) -> int:
    import glob as _glob
    import os as _os

    path = f"{sf_dir}/{name}.parquet"
    if _os.path.isdir(path):
        return sum(_os.path.getsize(p)
                   for p in _glob.glob(f"{path}/*.parquet"))
    try:
        return _os.path.getsize(path)
    except OSError:
        return 0


def load_spread(spark: SparkSession, sf_dir: str, name: str,
                *cols: str) -> DataFrame:
    """``load`` + a scale-adaptive parallelism floor (guide §2/§6).

    The driver fixtures are single-file, single-row-group parquet (5-130
    MB), so under any ``maxPartitionBytes`` >= the file size the scan
    yields ONE split and every doc-local kernel downstream runs on one
    core of the ``local[32]`` session. When the file layout would yield
    fewer splits than the session has cores (and the table is small
    enough that moving it once is trivial), round-robin repartition to
    the default parallelism right after the narrow column select — the
    shuffled volume is bounded by the condition itself, and at
    production scale (many splits) the condition is false and the plan
    is untouched, so this is a floor, not a tuned constant."""
    df = load(spark, sf_dir, name)
    if cols:
        df = df.select(*cols)
    size = _table_bytes(sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    try:
        raw = spark.conf.get("spark.sql.files.maxPartitionBytes") \
            .strip().lower().removesuffix("b")
        shift = {"k": 10, "m": 20, "g": 30, "t": 40}.get(raw[-1:], 0)
        max_split = int(raw[:-1] if shift else raw) << shift
    except (ValueError, AttributeError, IndexError):
        max_split = 128 << 20
    est_splits = max(1, -(-size // max(max_split, 1)))
    if est_splits < cores and SPREAD_MIN_BYTES <= size <= SPREAD_MAX_BYTES:
        df = df.repartition(cores)
    return df
