"""Deterministic synthetic Common-Crawl-style web pages (FIXTURES.md F1).

Schema mandated by the graft input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Token mixture mirrors the reference's dataset generator
(scripts/gen_datasets.py:4-19): 10% 'tok123', 10% 'tok456', 10% range
cluster 'tokr100'..'tokr110', 70% uniform 'tok1000'..'tok9999' — so exact
frequencies of the planted tokens are known oracles, like the reference's
items 123 / 456 / [100,110].

Generation is pure JVM (spark.range + higher-order functions + an affine
PRNG keyed on row id) — no Python in the loop, scales linearly with cores,
and is a pure function of (seed, n_pages): byte-stable across runs and
parallelism levels. The html wraps text in a fixed template so
``extract_text(html) == text`` byte-identically (the per-row invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sketches.hashing import MERSENNE_PRIME

DEFAULT_SEED = 12345
N_HOSTS = 1000
HTML_PREFIX = "<html><head><title>T"
HTML_MID = "</title></head><body><p>"
HTML_SUFFIX = "</p></body></html>"
LANGS = ["en", "de", "it", "fr", "zh"]
LANG_CUM = [0.55, 0.70, 0.82, 0.92, 1.0]


def _u(expr: str, salt: int, seed: int) -> str:
    """Affine PRNG on BIGINT: u(x) in [0, p) — same family as the sketch
    hashes so tests can replay it in numpy/SQL."""
    a = 1_103_515_245 + 2 * salt
    b = (12_345 + seed * 1_000_003 + salt * 7_919) % MERSENNE_PRIME
    return f"((({a} * (({expr}) % {MERSENNE_PRIME}) + {b}) % {MERSENNE_PRIME}))"


def _u01(expr: str, salt: int, seed: int) -> str:
    return f"(CAST({_u(expr, salt, seed)} AS DOUBLE) / {MERSENNE_PRIME}.0)"


def token_expr(page_expr: str, pos_expr: str, seed: int) -> str:
    """SQL for the token at (page, pos) under the reference mixture."""
    x = f"(({page_expr}) * 1024 + ({pos_expr}))"
    r = _u01(x, 1, seed)
    v = _u(x, 2, seed)
    return (
        f"CASE WHEN {r} < 0.1 THEN 'tok123' "
        f"WHEN {r} < 0.2 THEN 'tok456' "
        f"WHEN {r} < 0.3 THEN concat('tokr', CAST(100 + ({v} % 11) AS STRING)) "
        f"ELSE concat('tok', CAST(1000 + ({v} % 9000) AS STRING)) END"
    )


def pareto_token_expr(page_expr: str, pos_expr: str, seed: int) -> str:
    """Pareto(alpha=2)-skewed token ids clipped to [0, 9999] — the
    reference's skewed generator (scripts/dataset_generator.py:6-12):
    inverse-transform sampling, id = floor(1/sqrt(1-u)) - 1."""
    x = f"(({page_expr}) * 1024 + ({pos_expr}))"
    u = _u01(x, 6, seed)
    vid = f"LEAST(CAST(FLOOR(1.0 / sqrt(1.0 - LEAST({u}, 0.99999999))) AS BIGINT) - 1, 9999)"
    return f"concat('tok', CAST({vid} AS STRING))"


def web_pages(spark: SparkSession, n_pages: int, *, seed: int = DEFAULT_SEED,
              partitions: int | None = None,
              min_tokens: int = 20, max_tokens: int = 200,
              token_dist: str = "mixture") -> DataFrame:
    """token_dist='mixture' (F1, planted heavy hitters) or 'pareto'
    (F4: Pareto-skewed tokens + 80% of pages on 3 hosts — the heavy-skew
    fixture for salted-repartition and heavy-hitter stress tests)."""
    df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    pid = "id"
    n_tok = f"({min_tokens} + ({_u(pid, 3, seed)} % {max_tokens - min_tokens + 1}))"
    if token_dist == "pareto":
        # 80% of pages concentrated on 3 hosts (FIXTURES F4)
        hu = _u01(pid, 4, seed)
        host = (f"CASE WHEN {hu} < 0.8 THEN CAST({_u(pid, 7, seed)} % 3 AS BIGINT) "
                f"ELSE CAST(3 + ({_u(pid, 8, seed)} % {N_HOSTS - 3}) AS BIGINT) END")
        tok = pareto_token_expr(pid, "pos", seed)
    elif token_dist == "mixture":
        # host skew: cube the uniform -> a few dominant hosts (FIXTURES F1)
        host = f"CAST({N_HOSTS}.0 * pow({_u01(pid, 4, seed)}, 3.0) AS BIGINT)"
        tok = token_expr(pid, "pos", seed)
    else:
        raise ValueError(f"unknown token_dist {token_dist!r}")
    lang_u = _u01(pid, 5, seed)
    lang = "CASE " + " ".join(
        f"WHEN {lang_u} < {c} THEN '{l}'" for c, l in zip(LANG_CUM, LANGS)
    ) + " END"
    text = (
        f"array_join(transform(sequence(0, {n_tok} - 1), "
        f"pos -> {tok}), ' ')"
    )
    out = df.select(
        F.expr(f"concat('https://host', {host}, '.example/page', id)").alias("url"),
        F.expr("timestampadd(SECOND, id, timestamp'2026-01-01 00:00:00')").alias("warc_ts"),
        F.expr("id").alias("page_id"),
        F.expr(text).alias("text"),
        F.expr(lang).alias("lang"),
    )
    html = F.encode(
        F.concat(F.lit(HTML_PREFIX), F.col("page_id").cast("string"), F.lit(HTML_MID),
                 F.col("text"), F.lit(HTML_SUFFIX)),
        "UTF-8",
    ).alias("html")
    return out.select("url", "warc_ts", html, "text", "lang")


def extract_text(html_col) -> "F.Column":
    """html(binary) -> text(string): the deterministic reference extractor —
    contents of the single <p> block. Pure JVM (decode + regexp_extract);
    the invariant test asserts extract_text(html) == text byte-identically."""
    return F.regexp_extract(F.decode(html_col, "UTF-8"), "<p>(.*)</p>", 1)
