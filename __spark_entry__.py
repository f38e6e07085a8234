"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (CMS heavy hitters over document tokens)
at sf0.001. ``queries()`` / ``oracle_sql()`` — one entry per implemented
operator from SURVEY.md §2; DuckDB oracles replay the sketch hash math
exactly (integer arithmetic, seed-derived constants baked into the SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from parallel_count_min_sketch_spark.plans import all_queries

    return all_queries()["cms_heavy_hitters"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from parallel_count_min_sketch_spark.plans import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from parallel_count_min_sketch_spark.plans import all_oracles

    return all_oracles()
