"""URL canonicalization — the normalization pass that precedes URL-level
dedup in a crawl pipeline (mirror crawls, tracking links, and case noise
otherwise inflate the frontier and defeat exact URL dedup).

Rules (the conservative, reversible-safe subset):

- scheme and host lowercased;
- default port stripped (``:443`` for https, ``:80`` for http; other
  ports kept);
- fragment dropped;
- query: tracking parameters removed (names starting ``utm_`` plus
  ``ref``/``fbclid``/``gclid``), remaining params sorted bytewise, empty
  query collapsed to no ``?``;
- path and non-tracking param VALUES untouched (no percent-decoding —
  decoding is not canonical across servers).

Everything is whole-stage-codegen Spark SQL expressions chained with
``withColumn`` — per-row string ops, no shuffle, no Python. The DuckDB
oracle replays each step with the dialect twins (split_part/instr/
string_split/list_filter/list_sort/array_to_string are aligned across
the two engines; ``substring(p, 1, 4) = 'utm_'`` is used instead of
startswith/starts_with, whose names differ).

No counterpart in the reference (C kernel, no URL handling); this
belongs to the training-data-pipeline surface the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRACKING_NAMES = ("ref", "fbclid", "gclid")


def _param_filter(var: str = "p") -> str:
    names = ", ".join(f"'{n}'" for n in TRACKING_NAMES)
    return (f"{var} <> '' AND substring({var}, 1, 4) <> 'utm_' "
            f"AND split_part({var}, '=', 1) NOT IN ({names})")


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "canon_url") -> DataFrame:
    """Adds ``out_col`` (canonical form), ``n_dropped_params`` (tracking
    params removed) and ``had_fragment`` to ``df``. Intermediate columns
    are dropped; input column order is preserved."""
    steps = {
        "_u": f"split_part({url_col}, '#', 1)",
        "had_fragment": f"instr({url_col}, '#') > 0",
        "_scheme": "lower(split_part(_u, '://', 1))",
        "_rest": "split_part(_u, '://', 2)",
        "_hostport": "split_part(_rest, '/', 1)",
        "_pathq": "substring(_rest, length(_hostport) + 1)",
        "_host": "lower(split_part(_hostport, ':', 1))",
        "_port": "split_part(_hostport, ':', 2)",
        "_portc": ("CASE WHEN _port = '' OR (_scheme = 'https' AND _port = '443') "
                   "OR (_scheme = 'http' AND _port = '80') "
                   "THEN '' ELSE ':' || _port END"),
        "_path": "split_part(_pathq, '?', 1)",
        "_query": "split_part(_pathq, '?', 2)",
        "_rawp": "filter(split(_query, '&'), p -> p <> '')",
        "_params": f"filter(split(_query, '&'), p -> {_param_filter()})",
        "n_dropped_params": "CAST(size(_rawp) - size(_params) AS BIGINT)",
        out_col: ("_scheme || '://' || _host || _portc || _path || "
                  "CASE WHEN size(_params) = 0 THEN '' "
                  "ELSE '?' || array_join(array_sort(_params), '&') END"),
    }
    for name, expr in steps.items():
        df = df.withColumn(name, F.expr(expr))
    return df.drop("_u", "_scheme", "_rest", "_hostport", "_pathq", "_host",
                   "_port", "_portc", "_path", "_query", "_rawp", "_params")


def canonical_steps_duckdb(url_expr: str) -> str:
    """The oracle twin: one DuckDB SELECT-fragment computing
    (canon_url, n_dropped_params, had_fragment) from ``url_expr`` via the
    same rule chain. Returned as a comma-joined projection list intended
    for ``SELECT doc_id, <this> FROM ...``."""
    u = f"split_part({url_expr}, '#', 1)"
    scheme = f"lower(split_part({u}, '://', 1))"
    rest = f"split_part({u}, '://', 2)"
    hostport = f"split_part({rest}, '/', 1)"
    pathq = f"substring({rest}, length({hostport}) + 1)"
    host = f"lower(split_part({hostport}, ':', 1))"
    port = f"split_part({hostport}, ':', 2)"
    portc = (f"CASE WHEN {port} = '' OR ({scheme} = 'https' AND {port} = '443') "
             f"OR ({scheme} = 'http' AND {port} = '80') "
             f"THEN '' ELSE ':' || {port} END")
    path = f"split_part({pathq}, '?', 1)"
    query = f"split_part({pathq}, '?', 2)"
    rawp = f"list_filter(string_split({query}, '&'), p -> p <> '')"
    names = ", ".join(f"'{n}'" for n in TRACKING_NAMES)
    params = (f"list_filter(string_split({query}, '&'), p -> p <> '' "
              f"AND substring(p, 1, 4) <> 'utm_' "
              f"AND split_part(p, '=', 1) NOT IN ({names}))")
    canon = (f"{scheme} || '://' || {host} || {portc} || {path} || "
             f"CASE WHEN len({params}) = 0 THEN '' "
             f"ELSE '?' || array_to_string(list_sort({params}), '&') END")
    return (f"{canon} AS canon_url, "
            f"CAST(len({rawp}) - len({params}) AS BIGINT) AS n_dropped_params, "
            f"instr({url_expr}, '#') > 0 AS had_fragment")
