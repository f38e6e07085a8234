"""Driver-contract queries for HLL / Bloom / KLL / t-digest.

Where the sketch state is integer-exact (HLL registers, Bloom membership)
the DuckDB oracle replays the hash math bit-for-bit. Float estimators
(HLL cardinality, quantiles) are rows-only here and accuracy-tested in
pytest against exact answers — the driver records the weaker check for
those, by design.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..config import affine_sql
from ..operators.sketch_agg import build_sketch
from ..sketches.bloom import BloomFilter
from ..sketches.hll import HyperLogLog
from ..sketches.kll import KLLSketch
from ..sketches.tdigest import TDigest
from ..sources.tables import load

HLL_PRECISION = 12
HLL_SEED = 77
BLOOM_SEED = 99
BLOOM_EXPECTED = 20_000
BLOOM_FPP = 0.01
BLOOM_PROBES = [1, 2, 3, 123, 456, 10_001, 999_999, 123_456_789]
QUANTS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
KLL_K = 200
KLL_SEED = 5
TD_COMPRESSION = 200.0


def _mk_hll():
    return HyperLogLog(HLL_PRECISION, HLL_SEED)


# module-level wrappers: pickled by reference (a bound classmethod would be
# serialized by value and trips over module-level struct.Struct constants)
def _hll_from_bytes(b):
    return HyperLogLog.from_bytes(b)


def _bloom_from_bytes(b):
    return BloomFilter.from_bytes(b)


def _kll_from_bytes(b):
    return KLLSketch.from_bytes(b)


def _td_from_bytes(b):
    return TDigest.from_bytes(b)


def _mk_kll():
    return KLLSketch(KLL_K, KLL_SEED)


def _mk_td():
    return TDigest(TD_COMPRESSION)


def q_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Arrow-kernel HLL build over lineitem.l_partkey; returns
    the non-zero registers — integer state, checked exactly vs SQL."""
    li = load(spark, sf_dir, "lineitem")
    sk = build_sketch(li, "l_partkey", _mk_hll, _hll_from_bytes)
    nz = np.flatnonzero(sk.registers)
    rows = [(int(b), int(sk.registers[b])) for b in nz]
    return spark.createDataFrame(rows, "bucket BIGINT, register BIGINT").orderBy("bucket")


def _hll_sql() -> str:
    hll = _mk_hll()
    a, b = hll.a, hll.b
    h1 = affine_sql(int(a[0]), int(b[0]), "item_id")
    h2 = affine_sql(int(a[1]), int(b[1]), "item_id")
    return f"""
WITH ids AS (SELECT CAST(l_partkey AS BIGINT) AS item_id FROM lineitem),
hashed AS (SELECT {h1} AS h1, {h2} AS h2 FROM ids),
regs AS (
  SELECT h1 % {hll.m} AS bucket,
         CASE WHEN h2 = 0 THEN 32
              ELSE CAST(log2(h2 & -h2) AS BIGINT) + 1 END AS rho
  FROM hashed
)
SELECT bucket, CAST(MAX(rho) AS BIGINT) AS register
FROM regs GROUP BY bucket ORDER BY bucket
"""


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL cardinality estimate next to the exact distinct count and the
    in-bound flag (rows-only check; pytest asserts the bound)."""
    li = load(spark, sf_dir, "lineitem")
    sk = build_sketch(li, "l_partkey", _mk_hll, _hll_from_bytes)
    exact = li.select("l_partkey").distinct().count()
    est = sk.estimate()
    rel = abs(est - exact) / max(exact, 1)
    ok = rel < 5 * (1.04 / np.sqrt(sk.m))
    return spark.createDataFrame(
        [(float(round(est, 3)), int(exact), float(round(rel, 6)), bool(ok))],
        "hll_estimate DOUBLE, exact_distinct BIGINT, rel_error DOUBLE, within_bound BOOLEAN",
    )


def _mk_bloom():
    return BloomFilter(BLOOM_EXPECTED, BLOOM_FPP, seed=BLOOM_SEED)


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter over part.p_partkey probed with a fixed id list —
    membership bits replayed exactly by the SQL oracle."""
    part = load(spark, sf_dir, "part")
    bf = build_sketch(part, "p_partkey", _mk_bloom, _bloom_from_bytes)
    member = bf.contains_batch(np.array(BLOOM_PROBES, dtype=np.int64))
    rows = [(int(x), bool(m)) for x, m in zip(BLOOM_PROBES, member)]
    return spark.createDataFrame(rows, "item BIGINT, member BOOLEAN").orderBy("item")


def _bloom_sql() -> str:
    bf = _mk_bloom()
    pos_exprs = [
        f"SELECT item, {affine_sql(int(bf.a[j]), int(bf.b[j]), 'item_id')} % {bf.m} AS pos FROM probes"
        for j in range(bf.k)
    ]
    ins_exprs = [
        f"SELECT {affine_sql(int(bf.a[j]), int(bf.b[j]), 'item_id')} % {bf.m} AS pos FROM ids"
        for j in range(bf.k)
    ]
    probes = ", ".join(f"(CAST({x} AS BIGINT))" for x in BLOOM_PROBES)
    return f"""
WITH ids AS (SELECT CAST(p_partkey AS BIGINT) AS item_id FROM part),
probes AS (SELECT item, item AS item_id FROM (VALUES {probes}) AS v(item)),
set_bits AS (SELECT DISTINCT pos FROM ({' UNION ALL '.join(ins_exprs)})),
probe_pos AS ({' UNION ALL '.join(pos_exprs)})
SELECT p.item AS item,
       (COUNT(*) FILTER (WHERE s.pos IS NOT NULL) = {bf.k}) AS member
FROM probe_pos p LEFT JOIN set_bits s USING (pos)
GROUP BY p.item ORDER BY p.item
"""


def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantiles of lineitem.l_extendedprice (rows-only; pytest asserts
    the rank-error bound against the exact distribution)."""
    li = load(spark, sf_dir, "lineitem")
    sk = build_sketch(li, "l_extendedprice", _mk_kll, _kll_from_bytes, as_float=True)
    vals = sk.quantile(np.array(QUANTS))
    rows = [(float(q), float(v)) for q, v in zip(QUANTS, vals)]
    return spark.createDataFrame(rows, "q DOUBLE, kll_value DOUBLE").orderBy("q")


def q_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest quantiles of lineitem.l_extendedprice (rows-only)."""
    li = load(spark, sf_dir, "lineitem")
    sk = build_sketch(li, "l_extendedprice", _mk_td, _td_from_bytes, as_float=True)
    vals = sk.quantile(np.array(QUANTS))
    rows = [(float(q), float(v)) for q, v in zip(QUANTS, vals)]
    return spark.createDataFrame(rows, "q DOUBLE, tdigest_value DOUBLE").orderBy("q")


def q_cms_grouped_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One CMS per language over document tokens (the grouped two-phase
    Arrow path), each probed for token 'key' — group totals and estimates
    replayed exactly by the SQL oracle."""
    import pyspark.sql.functions as F

    from ..config import CMSConfig
    from ..operators.agg import cms_grouped
    from ..sketches.cms import CountMinSketch
    from ..sketches.hashing import djb2_py

    cfg = CMSConfig(epsilon=0.001, delta=0.1, seed=12345)
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    grouped = cms_grouped(toks, "lang", "tok", cfg, string_items=True).collect()
    probe = np.int64(djb2_py("key"))
    rows = []
    for r in grouped:
        sk = CountMinSketch.from_bytes(bytes(r["sketch"]), cfg.epsilon, cfg.delta)
        rows.append((r["group"], int(r["total"]), int(sk.point_query(probe)[0])))
    return spark.createDataFrame(
        rows, "lang STRING, total_tokens BIGINT, est_key BIGINT"
    ).orderBy("lang")


def _sql_cms_grouped() -> str:
    from ..config import CMSConfig

    cfg = CMSConfig(epsilon=0.001, delta=0.1, seed=12345)
    bucket_cols = " UNION ALL ".join(
        f"SELECT lang, {j} AS depth_row, {cfg.bucket_sql(j, 'item_id')} AS bucket, "
        f"CAST(COUNT(*) AS BIGINT) AS counter FROM ids GROUP BY 1, 3"
        for j in range(cfg.depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {j} AS depth_row, {cfg.bucket_sql(j, djb2_sql_duckdb_local('__probe__'))} AS bucket"
        for j in range(cfg.depth)
    )
    return f"""
WITH toks AS (
  SELECT lang, tok FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> ''
),
ids AS (SELECT lang, {djb2_sql_duckdb_local('tok')} AS item_id FROM toks),
buckets AS ({bucket_cols}),
probes AS ({probe_rows}),
lang_probes AS (
  SELECT l.lang, p.depth_row, p.bucket
  FROM (SELECT DISTINCT lang FROM toks) l CROSS JOIN probes p
),
ests AS (
  SELECT lp.lang, MIN(COALESCE(b.counter, 0)) AS est
  FROM lang_probes lp LEFT JOIN buckets b
    ON b.lang = lp.lang AND b.depth_row = lp.depth_row AND b.bucket = lp.bucket
  GROUP BY lp.lang
),
totals AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS total_tokens FROM toks GROUP BY 1)
SELECT t.lang AS lang, t.total_tokens,
       CAST(COALESCE(e.est, 0) AS BIGINT) AS est_key
FROM totals t LEFT JOIN ests e USING (lang)
ORDER BY lang
"""


def djb2_sql_duckdb_local(expr: str) -> str:
    from ..config import djb2_sql_duckdb
    from ..sketches.hashing import djb2_py

    if expr == "__probe__":
        return f"CAST({djb2_py('key')} AS BIGINT)"
    return djb2_sql_duckdb(expr)


DYADIC_SEED = 12345
DYADIC_BASE = 16
DYADIC_LEVELS = 8
DYADIC_RANGE = (100, 1500)  # wide range: naive would need 1401 point queries


def _mk_dyadic():
    from ..sketches.dyadic import DyadicCMS

    return DyadicCMS(0.001, 0.1, DYADIC_SEED, base=DYADIC_BASE, levels=DYADIC_LEVELS)


def _dyadic_from_bytes(b):
    from ..sketches.dyadic import DyadicCMS

    return DyadicCMS.from_bytes(b, 0.001, 0.1)


def q_dyadic_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(log U) range query via the dyadic CMS hierarchy (vs the
    reference's O(range) loop) — distributed Arrow build, integer-exact
    SQL replay of every level's counters."""
    li = load(spark, sf_dir, "lineitem")
    sk = build_sketch(li, "l_partkey", _mk_dyadic, _dyadic_from_bytes)
    lo, hi = DYADIC_RANGE
    est = sk.range_query(lo, hi)
    return spark.createDataFrame(
        [(lo, hi, int(est))], "range_lo BIGINT, range_hi BIGINT, dyadic_range_sum BIGINT"
    )


def _sql_dyadic() -> str:
    from ..config import CMSConfig
    from ..sketches.dyadic import decompose, level_seed

    lo, hi = DYADIC_RANGE
    parts = decompose(lo, hi, DYADIC_BASE, DYADIC_LEVELS)
    by_level: dict[int, list[int]] = {}
    for l, k in parts:
        by_level.setdefault(l, []).append(k)
    level_sqls = []
    for l, keys in sorted(by_level.items()):
        cfg = CMSConfig(epsilon=0.001, delta=0.1, seed=level_seed(DYADIC_SEED, l))
        shift = DYADIC_BASE ** l
        buckets = " UNION ALL ".join(
            f"SELECT {j} AS depth_row, {cfg.bucket_sql(j, 'item_id')} AS bucket, "
            f"CAST(COUNT(*) AS BIGINT) AS counter "
            f"FROM (SELECT CAST(l_partkey AS BIGINT) // {shift} AS item_id FROM lineitem) GROUP BY 2"
            for j in range(cfg.depth)
        )
        probes = " UNION ALL ".join(
            f"SELECT {int(k)} AS item, {j} AS depth_row, "
            f"{cfg.bucket_sql(j, f'CAST({int(k)} AS BIGINT)')} AS bucket"
            for k in keys for j in range(cfg.depth)
        )
        level_sqls.append(f"""
SELECT SUM(est) AS s FROM (
  SELECT p.item, MIN(COALESCE(b.counter, 0)) AS est
  FROM ({probes}) p LEFT JOIN ({buckets}) b USING (depth_row, bucket)
  GROUP BY p.item
)""")
    union = " UNION ALL ".join(f"SELECT s FROM ({q})" for q in level_sqls)
    return f"""
SELECT CAST({lo} AS BIGINT) AS range_lo, CAST({hi} AS BIGINT) AS range_hi,
       CAST(SUM(s) AS BIGINT) AS dyadic_range_sum
FROM ({union})
"""


SKETCH_QUERIES = {
    "cms_grouped_by_lang": (q_cms_grouped_by_lang, _sql_cms_grouped()),
    "dyadic_range_query": (q_dyadic_range_query, _sql_dyadic()),
    "hll_registers": (q_hll_registers, _hll_sql()),
    "hll_distinct": (q_hll_distinct, None),
    "bloom_membership": (q_bloom_membership, _bloom_sql()),
    "kll_quantiles": (q_kll_quantiles, None),
    "tdigest_quantiles": (q_tdigest_quantiles, None),
}
