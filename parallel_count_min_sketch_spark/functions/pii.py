"""PII detection / redaction as pure codegen expressions.

Every production training-data pipeline scrubs contact PII (emails,
phone numbers, IP addresses) before tokenization. These kernels are
regexp_count / regexp_replace column expressions — JVM-side, no Python
in the row path — with DuckDB twins for oracle replay.

Pattern dialect: the subset common to Java regex (Spark) and RE2
(DuckDB) — character classes, bounded repetition, non-capturing groups,
`\\b` word boundaries. No lookaround (RE2 has none), no backrefs.

Redaction order is fixed (email -> phone -> ip) and identical in both
engines, so chained replacement is deterministic: an email's digits are
consumed before the phone/IP scans ever see them.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

_KINDS = (("email", EMAIL_RE, "<EMAIL>"),
          ("phone", PHONE_RE, "<PHONE>"),
          ("ip", IPV4_RE, "<IP>"))


def pii_counts(text: str = "text") -> dict[str, Column]:
    """{kind: match count} over the column, as bigint codegen exprs."""
    return {
        kind: F.regexp_count(F.col(text), F.lit(pat)).cast("bigint")
        for kind, pat, _ in _KINDS
    }


def redact_pii(text: str = "text") -> Column:
    """Replace every email/phone/IPv4 match with a typed placeholder
    (fixed order, all-occurrence replacement — Spark regexp_replace
    default)."""
    col = F.col(text)
    for _, pat, tag in _KINDS:
        col = F.regexp_replace(col, pat, tag)
    return col


def duck_pii_count(kind: str, text_expr: str = "text") -> str:
    pat = {k: p for k, p, _ in _KINDS}[kind]
    pat_sql = pat.replace("'", "''")
    return (f"CAST(length(regexp_extract_all({text_expr}, '{pat_sql}')) "
            f"AS BIGINT)")


def duck_redact_pii(text_expr: str = "text") -> str:
    """DuckDB twin: regexp_replace needs the explicit 'g' flag (Spark
    replaces all occurrences by default, DuckDB only the first)."""
    expr = text_expr
    for _, pat, tag in _KINDS:
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{tag}', 'g')"
    return expr
