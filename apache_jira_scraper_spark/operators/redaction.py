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
# privacy stage unredacted with n_phone=0 (r04 review). The match is
# boundary-anchored on both ends (r05, per advice): it must START at '+',
# '(' or a \b-preceded digit and END at a \b, so a 10-12 digit prefix of a
# longer digit run (order numbers, 16-digit card numbers) no longer
# half-redacts — \b between two digits never matches, which rejects any
# mid-run start or end. \b is in the Java∩RE2 subset (no lookarounds
# needed). An SSN still cannot match the phone shape: d3-d2-d4 has no
# 3-digit middle group.
#
# ACCEPTED RECALL MISS (r05 advice, intentional — do not "fix" blindly):
# a phone glued to a preceding word character ('tel5551234567',
# 'x555-123-4567') no longer matches, because \b never fires between two
# word chars and the anchor set has no lookbehind to allow a mid-word
# start without re-admitting the half-redaction bug. Pinned in
# tests/test_redaction.py::test_phone_glued_to_word_char_is_intentionally_missed.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    (
        "phone",
        r"(?:\+|\(|\b)(?:[0-9]{1,2}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b",
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


def pii_redact_arrow(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """RE2 twin of pii_redact for hot paths (the driver gate): one
    `mapInArrow` pass whose batches run pyarrow.compute's RE2 kernels
    (count_substring_regex / replace_substring_regex) instead of eight
    Java-regex passes inside codegen — 2.6x faster at sf0.1 (0.45 ->
    0.18 s, r13 optimization round, guide §4.2) because RE2's DFA scan
    beats java.util.regex backtracking on full-document text.

    Same PII_PATTERNS constants, same output contract as
    ``pii_redact(ordered=False)``. Result identity is guaranteed by the
    module's Java∩RE2 pattern subset (the DuckDB oracle already runs
    these patterns under RE2) and pinned exactly in
    tests/test_redaction.py::test_pii_redact_arrow_identity. Only
    (id, text) crosses the Python boundary — schema declared, column
    pruning preserved by the explicit select."""
    import pyarrow as pa

    pats = tuple(PII_PATTERNS)

    def fn(it):
        import pyarrow.compute as pc

        for batch in it:
            txt = batch.column(text_col)
            cols = {id_col: batch.column(id_col)}
            for name, pat, _tok in pats:
                cols[f"n_{name}"] = pc.cast(
                    pc.count_substring_regex(txt, pat), pa.int32()
                )
            red = txt
            for _name, pat, tok in pats:
                red = pc.replace_substring_regex(red, pat, tok)
            cols["redacted"] = red
            yield pa.RecordBatch.from_pydict(cols)

    counts = ", ".join(f"n_{name} int" for name, _p, _t in pats)
    return docs.select(id_col, text_col).mapInArrow(
        fn, f"{id_col} long, {counts}, redacted string"
    )


# URL canonicalization steps (Common-Crawl-style dedup key). Every pattern
# stays in the Java∩RE2 subset AND avoids replacement backrefs — Spark spells
# them $1 where DuckDB spells them \\1, so a shared pattern set must not use
# them. The URL is split ONCE at the first '?' (the real path/query
# boundary) and the utm / trailing-slash passes run on their own side of
# the split — so a query VALUE containing '/?', 'utm_'-ish text, or a
# trailing '/' (e.g. ?redirect=/p/?x) can never be rewritten as if it were
# path/param structure (r04 advice: the global passes made the dedup key
# lossy). '&' inside the query part IS a parameter separator by RFC 3986 —
# a literal '&' in a value must be %-encoded — so the in-query utm passes
# are boundary-exact.
_URL_FRAGMENT = r"#.*"
_URL_PRE_QUERY = r"^[^?]*"  # everything before the first '?' (the path side)
_URL_UTM_AMP = r"&utm_[^&#]*"
_URL_UTM_LEAD = r"^\?utm_[^&#]*&"
_URL_UTM_ONLY = r"^\?utm_[^&#]*$"
# (?i): the scheme/host match must be case-insensitive ('HTTP://A.COM' is
# the same resource) — the inline flag is in the Java∩RE2 subset
_URL_HOST = r"(?i)^https?://([^/?#]+)"
_URL_SCHEME_HOST = r"(?i)^https?://[^/?#]+"
_URL_TRAIL_SLASH = r"/$"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of an http(s) URL — THE dedup key for crawl-style
    URL-level deduplication: lowercase scheme+host, default port stripped
    (:80 for http, :443 for https), fragment and utm_* tracking params
    removed, one trailing slash stripped. The path/query case is
    PRESERVED (paths are case-sensitive on real servers). The utm and
    slash passes are anchored to the first-'?' path/query split, so query
    values containing '/?' or 'utm_'-like text are never collapsed.
    Non-URL input comes back unchanged except the generic cleanups (no
    scheme+host to rewrite). Pure column algebra, identical passes in the
    DuckDB twin.
    """
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, _URL_FRAGMENT, "")
    # split once at the first '?': both regexes are ^-anchored, so each
    # replaces at most one match and the pair is an exact partition of u
    path = F.regexp_extract(u, _URL_PRE_QUERY, 0)
    qry = F.regexp_replace(u, _URL_PRE_QUERY, "")
    qry = F.regexp_replace(qry, _URL_UTM_AMP, "")
    qry = F.regexp_replace(qry, _URL_UTM_LEAD, "?")
    qry = F.regexp_replace(qry, _URL_UTM_ONLY, "")
    # one trailing slash off the path side: with a query this is the
    # '/?'-boundary slash, without one it's the plain trailing slash —
    # either way the query part keeps its own trailing characters
    path = F.regexp_replace(path, _URL_TRAIL_SLASH, "")
    u = F.concat(path, qry)
    host = F.regexp_extract(u, _URL_HOST, 1)
    rest = F.regexp_replace(u, _URL_SCHEME_HOST, "")
    is_https = F.lower(F.substring(u, 1, 8)) == "https://"
    scheme = F.when(is_https, F.lit("https")).otherwise(F.lit("http"))
    default_port = F.when(is_https, F.lit(":443")).otherwise(F.lit(":80"))
    host_c = F.lower(host)
    host_c = F.when(
        host_c.endswith(default_port),
        F.substring(host_c, F.lit(1), F.length(host_c) - F.length(default_port)),
    ).otherwise(host_c)
    return F.when(host != "", F.concat(scheme, F.lit("://"), host_c, rest)).otherwise(u)


_CANON_SQL_TPL = """
CASE WHEN regexp_extract(u5, '{host}', 1) != '' THEN
  (CASE WHEN starts_with(lower(u5), 'https://') THEN 'https' ELSE 'http' END) || '://' ||
  (CASE
     WHEN starts_with(lower(u5), 'https://') AND ends_with(lower(regexp_extract(u5, '{host}', 1)), ':443')
       THEN substr(lower(regexp_extract(u5, '{host}', 1)), 1, length(regexp_extract(u5, '{host}', 1)) - 4)
     WHEN NOT starts_with(lower(u5), 'https://') AND ends_with(lower(regexp_extract(u5, '{host}', 1)), ':80')
       THEN substr(lower(regexp_extract(u5, '{host}', 1)), 1, length(regexp_extract(u5, '{host}', 1)) - 3)
     ELSE lower(regexp_extract(u5, '{host}', 1))
   END) ||
  regexp_replace(u5, '{scheme_host}', '')
ELSE u5 END
"""


def canonicalize_url_sql(col: str) -> str:
    """DuckDB twin of canonicalize_url over column expression `col` —
    generated from the SAME pattern constants. Emits a scalar expression
    that expects to be wrapped in a LATERAL/CTE naming the cleaned url
    `u5` (see url_dedup_sql)."""
    return _CANON_SQL_TPL.format(host=_URL_HOST, scheme_host=_URL_SCHEME_HOST)


def _clean_passes_sql(col: str) -> str:
    """The fragment/utm/trailing-slash passes as one nested expression,
    split at the first '?' exactly like canonicalize_url (same constants)."""
    u1 = f"regexp_replace({col}, '{_URL_FRAGMENT}', '', 'g')"
    path = f"regexp_extract({u1}, '{_URL_PRE_QUERY}', 0)"
    qry = f"regexp_replace({u1}, '{_URL_PRE_QUERY}', '')"
    q2 = f"regexp_replace({qry}, '{_URL_UTM_AMP}', '', 'g')"
    q3 = f"regexp_replace({q2}, '{_URL_UTM_LEAD}', '?')"
    q4 = f"regexp_replace({q3}, '{_URL_UTM_ONLY}', '')"
    p2 = f"regexp_replace({path}, '{_URL_TRAIL_SLASH}', '')"
    return f"({p2} || {q4})"


def url_dedup(urls: DataFrame, id_col: str = "doc_id", url_col: str = "url") -> DataFrame:
    """URL-level exact dedup on the canonical form: keep the lowest id per
    canonical URL — the crawl-frontier pass that runs BEFORE any content
    fetch/dedup (two fetches of http://A.com/x#frag and https variants of
    the same resource never enter the corpus twice). One hash shuffle on
    the canonical key, the same scale shape as content exact-dedup.

    Returns (canonical_url, keeper_id, n_variants)."""
    return (
        urls.select(F.col(id_col).alias("_id"), canonicalize_url(url_col).alias("cu"))
        .groupBy("cu")
        .agg(F.min("_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_variants"))
        .select(F.col("cu").alias("canonical_url"), "keeper_id", "n_variants")
        .orderBy("canonical_url")
    )


def url_dedup_sql(table: str, id_col: str = "doc_id", url_col: str = "url") -> str:
    """DuckDB twin of url_dedup, generated from the same passes."""
    return f"""
WITH c AS (
  SELECT {id_col} AS _id, {_clean_passes_sql(url_col)} AS u5 FROM {table}
), k AS (
  SELECT _id, {canonicalize_url_sql("u5")} AS cu FROM c
)
SELECT cu AS canonical_url, MIN(_id) AS keeper_id, COUNT(1) AS n_variants
FROM k GROUP BY cu ORDER BY canonical_url
"""


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


# ---------------------------------------------------------------------------
# Driver gate (r05 rotation): the whole redaction family in one slot
# ---------------------------------------------------------------------------

def q_pii_url_redaction(spark, sf_dir: str) -> DataFrame:
    """Union-tagged driver gate for the redaction family — the most
    load-bearing pretraining stage previously outside the hard signal
    (VERDICT r04 item 2). Three legs over the documents table, harmonized
    to (leg, id, txt, m1..m4):

      redact     pii_redact:   id=doc_id, txt=redacted,
                 m1..m4 = n_email / n_ssn / n_phone / n_ip
      urlfilter  url_filter:   id=doc_id, txt=domains_csv,
                 m1=n_urls, m2=blocked(0/1), m3=m4=0
      urldedup   url_dedup over the URLs extracted from text:
                 id=keeper_id, txt=canonical_url, m1=n_variants, m2..m4=0

    Scale shape: redact and urlfilter are shuffle-free narrow maps sharing
    the documents scan; urldedup adds one hash shuffle on the canonical
    URL — exactly the shapes of the standalone operators, pytest-pinned in
    tests/test_redaction.py.
    """
    from ..io import load_table

    zero = F.lit(0).cast("bigint")
    docs = load_table(spark, sf_dir, "documents")
    # RE2 mapInArrow twin of pii_redact — row-identical (pinned in
    # tests/test_redaction.py), 2.6x faster on full-document text
    pii = pii_redact_arrow(docs)
    red_leg = pii.select(
        F.lit("redact").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("redacted").alias("txt"),
        F.col("n_email").cast("bigint").alias("m1"),
        F.col("n_ssn").cast("bigint").alias("m2"),
        F.col("n_phone").cast("bigint").alias("m3"),
        F.col("n_ip").cast("bigint").alias("m4"),
    )
    uf_leg = url_filter(docs).select(
        F.lit("urlfilter").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("domains_csv").alias("txt"),
        F.col("n_urls").cast("bigint").alias("m1"),
        F.col("blocked").cast("bigint").alias("m2"),
        zero.alias("m3"),
        zero.alias("m4"),
    )
    # The test corpus contains no literal URLs, so the urldedup leg
    # synthesizes three deterministic crawl-style variants per document
    # from the content fingerprint (same derivation in the DuckDB twin):
    # an uppercase-host default-port utm-tracked form, its clean http twin
    # (same canonical — collapses), and an https form (distinct scheme —
    # survives). Duplicate documents share md5(text), so content dups also
    # collapse across doc_ids, exercising keep-first semantics.
    h = F.md5("text")
    urls = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(F.lit("HTTP://Example.COM:80/"), h, F.lit("/?utm_source=x&a=1")),
                F.concat(F.lit("http://example.com/"), h, F.lit("?a=1")),
                F.concat(F.lit("https://example.com/"), h),
            )
        ).alias("url"),
    )
    ud_leg = url_dedup(urls).select(
        F.lit("urldedup").alias("leg"),
        F.col("keeper_id").alias("id"),
        F.col("canonical_url").alias("txt"),
        F.col("n_variants").cast("bigint").alias("m1"),
        zero.alias("m2"),
        zero.alias("m3"),
        zero.alias("m4"),
    )
    return red_leg.unionByName(uf_leg).unionByName(ud_leg).orderBy("leg", "id", "txt")


def pii_url_redaction_sql() -> str:
    """DuckDB twin of q_pii_url_redaction, assembled from the same per-leg
    SQL generators (pii_redact_sql / url_filter_sql / url_dedup_sql)."""
    urls_tbl = (
        "(SELECT doc_id, unnest(["
        "'HTTP://Example.COM:80/' || md5(text) || '/?utm_source=x&a=1', "
        "'http://example.com/' || md5(text) || '?a=1', "
        "'https://example.com/' || md5(text)"
        "]) AS url FROM documents)"
    )
    return f"""
SELECT 'redact' AS leg, doc_id AS id, redacted AS txt,
       CAST(n_email AS BIGINT) AS m1, CAST(n_ssn AS BIGINT) AS m2,
       CAST(n_phone AS BIGINT) AS m3, CAST(n_ip AS BIGINT) AS m4
FROM ({pii_redact_sql("documents")})
UNION ALL
SELECT 'urlfilter' AS leg, doc_id AS id, domains_csv AS txt,
       CAST(n_urls AS BIGINT) AS m1, CAST(blocked AS BIGINT) AS m2,
       CAST(0 AS BIGINT) AS m3, CAST(0 AS BIGINT) AS m4
FROM ({url_filter_sql("documents")})
UNION ALL
SELECT 'urldedup' AS leg, keeper_id AS id, canonical_url AS txt,
       CAST(n_variants AS BIGINT) AS m1, CAST(0 AS BIGINT) AS m2,
       CAST(0 AS BIGINT) AS m3, CAST(0 AS BIGINT) AS m4
FROM ({url_dedup_sql(urls_tbl)})
ORDER BY leg, id, txt
"""


def register_all() -> None:
    from ..registry import register

    register("pii_url_redaction", q_pii_url_redaction, pii_url_redaction_sql())
