"""Sketch configurations: pure functions of (epsilon, delta, seed).

Everything any executor (or the DuckDB oracle) needs to evaluate the hash
family is derivable from the config — the Spark-native replacement for the
reference's broadcast of rank 0's hash params (src/mpi/mpiV1.c:24-26).

``bucket_sql`` emits the bucket expression as ANSI SQL using only BIGINT
arithmetic, valid verbatim in BOTH Spark SQL and DuckDB — this is how the
correctness oracles replay the sketch math value-for-value.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .sketches.cms import dims
from .sketches.hashing import DJB2_INIT, LONG_PRIME, MERSENNE_PRIME, affine_params

# Reference defaults (src/core/count_min_sketch.h:13-14)
DEFAULT_EPSILON = 0.001
DEFAULT_DELTA = 0.1
DEFAULT_SEED = 12345


@dataclass(frozen=True)
class CMSConfig:
    epsilon: float = DEFAULT_EPSILON
    delta: float = DEFAULT_DELTA
    seed: int = DEFAULT_SEED
    depth: int = field(init=False)
    width: int = field(init=False)

    def __post_init__(self):
        d, w = dims(self.epsilon, self.delta)
        object.__setattr__(self, "depth", d)
        object.__setattr__(self, "width", w)

    @property
    def ab(self) -> tuple[np.ndarray, np.ndarray]:
        return affine_params(self.seed, self.depth)

    def new_sketch(self):
        from .sketches.cms import CountMinSketch

        return CountMinSketch(self.epsilon, self.delta, self.seed)

    # ---- SQL emission (shared by Spark SQL and DuckDB oracles) ----------
    def bucket_sql(self, row: int, item_expr: str) -> str:
        """h_row(item) as pure BIGINT SQL: ((a*(x%p)+b)%p)%w."""
        a, b = self.ab
        return affine_bucket_sql(int(a[row]), int(b[row]), self.width, item_expr)

    def bucket_sql_all_rows(self, item_expr: str) -> list[str]:
        return [self.bucket_sql(j, item_expr) for j in range(self.depth)]


def affine_bucket_sql(a: int, b: int, width: int, item_expr: str) -> str:
    """((a*(x%p)+b)%p)%width in pure BIGINT SQL — valid in Spark SQL and
    DuckDB alike; mirrors hashing.affine_hash exactly."""
    return (
        f"((({a} * (({item_expr}) % {MERSENNE_PRIME}) + {b})"
        f" % {MERSENNE_PRIME}) % {width})"
    )


def affine_sql(a: int, b: int, item_expr: str) -> str:
    """(a*(x%p)+b)%p in pure BIGINT SQL."""
    return f"(({a} * (({item_expr}) % {MERSENNE_PRIME}) + {b}) % {MERSENNE_PRIME})"


def djb2_sql_spark(col_expr: str) -> str:
    """djb2 mod LONG_PRIME as a Spark SQL higher-order-function expression
    (JVM-side, codegen'd — no Python). ASCII input assumed (matches the
    synthetic corpora; the numpy kernel hashes UTF-8 bytes)."""
    return (
        f"aggregate(transform(sequence(1, length({col_expr})), i -> "
        f"CAST(ascii(substring({col_expr}, i, 1)) AS BIGINT)), "
        f"CAST({DJB2_INIT} AS BIGINT), (h, c) -> (h * 33 + c) % {LONG_PRIME})"
    )


def djb2_sql_duckdb(col_expr: str) -> str:
    """Same fold in DuckDB (list_reduce over char codes)."""
    return (
        f"list_reduce(list_prepend(CAST({DJB2_INIT} AS BIGINT), "
        f"list_transform(range(1, length({col_expr}) + 1), i -> "
        f"CAST(ascii(substring({col_expr}, i, 1)) AS BIGINT))), "
        f"(h, c) -> (h * 33 + c) % {LONG_PRIME})"
    )
