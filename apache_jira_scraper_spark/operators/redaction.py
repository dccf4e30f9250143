"""PII redaction and URL/domain filtering — the privacy/compliance stage of
a large-scale training-data pipeline (SURVEY.md §2.11 [X]; extension, no
reference analog — the reference stores raw Jira text verbatim).

Both operators are pure column algebra (regexp_count / chained
regexp_replace / regexp_extract_all): embarrassingly parallel narrow maps
with no shuffle, running inside whole-stage codegen at any scale. The regex
patterns are module constants shared by the Spark expressions AND the DuckDB
SQL generators, so the two engines can never drift apart (same discipline as
similarity._bucket/_bucket_sql).

Portability: patterns stay in the Java-regex ∩ RE2 subset — character
classes, bounded quantifiers, alternation, non-capturing groups, \\b word
boundaries; no lookahead/backreferences (RE2 rejects them). DuckDB's
regexp_replace needs the explicit 'g' flag (first-match default); Spark's
replaces all matches by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Redaction classes, applied in order (email first so user@host never leaks
# its host into the URL/domain pass; SSN before PHONE so the d3-d2-d4 SSN
# shape is consumed before the phone pass scans the text). The phone
# country code is OPTIONAL — a mandatory 1-2 digit prefix made the
# pattern an 11-digit minimum, so the most common 10-digit forms
# ('555-123-4567', '(555) 123-4567', '555.123.4567') passed through the
# privacy stage unredacted with n_phone=0 (r04 review). An SSN still
# cannot match the phone shape: d3-d2-d4 has no 3-digit middle group.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    (
        "phone",
        r"(?:\+?[0-9]{1,2}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}",
        "<PHONE>",
    ),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)

URL_PATTERN = r"https?://[^ ]+"
DOMAIN_PATTERN = r"https?://([^/ ]+)"

DEFAULT_BLOCKLIST: tuple[str, ...] = ("spam.example", "tracker.example")


def pii_redact(docs: DataFrame, text_col: str = "text", ordered: bool = True) -> DataFrame:
    """Per-document PII scrub: one count column per PII class (taken BEFORE
    redaction) plus the fully redacted text after the ordered replacement
    chain. One projection — counts and redaction share the single scan.

    Returns (doc_id, n_email, n_ssn, n_phone, n_ip, redacted).
    """
    c: Column = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}") for name, pat, _ in PII_PATTERNS
    ]
    red = c
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    out = docs.select("doc_id", *counts, red.alias("redacted"))
    return out.orderBy("doc_id") if ordered else out


def pii_redact_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of pii_redact, generated from the same PII_PATTERNS."""
    counts = ",\n       ".join(
        f"len(regexp_extract_all({text_col}, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = text_col
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""
SELECT doc_id,
       {counts},
       {red} AS redacted
FROM {table} ORDER BY doc_id
"""


def url_filter(
    docs: DataFrame,
    blocked_domains: tuple[str, ...] = DEFAULT_BLOCKLIST,
    text_col: str = "text",
) -> DataFrame:
    """URL inventory + domain blocklist gate per document: URL count, the
    sorted distinct domain list (CSV — scalar per the canonical output
    contract), and whether any domain is on the blocklist. The blocklist is
    a plan literal (broadcast by construction); at 100 TB a big blocklist
    becomes a broadcast semi-join on an exploded domain column instead —
    same narrow scan either way.

    Returns (doc_id, n_urls, domains_csv, blocked).
    """
    c: Column = F.col(text_col)
    urls = F.regexp_extract_all(c, F.lit(URL_PATTERN), F.lit(0))
    domains = F.array_sort(
        F.array_distinct(
            F.transform(urls, lambda u: F.regexp_extract(u, DOMAIN_PATTERN, 1))
        )
    )
    blocked_arr = F.array(*[F.lit(d) for d in blocked_domains])
    base = docs.select("doc_id", urls.alias("urls"), domains.alias("domains"))
    return base.select(
        "doc_id",
        F.size("urls").alias("n_urls"),
        F.concat_ws(",", "domains").alias("domains_csv"),
        (
            F.size(F.filter(F.col("domains"), lambda d: F.array_contains(blocked_arr, d)))
            > 0
        ).alias("blocked"),
    ).orderBy("doc_id")


def url_filter_sql(
    table: str = "documents",
    blocked_domains: tuple[str, ...] = DEFAULT_BLOCKLIST,
    text_col: str = "text",
) -> str:
    """DuckDB twin of url_filter, generated from the same pattern constants."""
    blocklist = "[" + ", ".join(f"'{d}'" for d in blocked_domains) + "]"
    return f"""
WITH t AS (
  SELECT doc_id,
         regexp_extract_all({text_col}, '{URL_PATTERN}') AS urls
  FROM {table}
), d AS (
  SELECT doc_id, urls,
         list_sort(list_distinct(
           list_transform(urls, u -> regexp_extract(u, '{DOMAIN_PATTERN}', 1))
         )) AS domains
  FROM t
)
SELECT doc_id,
       len(urls) AS n_urls,
       COALESCE(array_to_string(domains, ','), '') AS domains_csv,
       len(list_filter(domains, x -> list_contains({blocklist}, x))) > 0 AS blocked
FROM d ORDER BY doc_id
"""
