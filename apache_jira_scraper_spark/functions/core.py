"""Core scalar functions (reference §2.8 F1-F8), as pure Column->Column
functions so they stay inside whole-stage codegen — no Python UDFs.

Each function replicates the *effective* behavior of the reference
implementation, pinned by the reference's own unit-test literals
(test_scrapper.py:32-80, mirrored in tests/test_functions.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# THE whitespace-run pattern, shared verbatim by the Spark expressions and
# every DuckDB oracle string: an EXPLICIT class, not \s, because the two
# engines disagree on \s — Java's includes vertical tab (\x0B), RE2's does
# not — so a document containing \x0B would clean differently per engine
# and hash-fail every gate built on cleaned text. The explicit class is
# Java's \s set (which also matches the reference's str.split()).
WS_RUN = r"[ \t\n\x0B\f\r]+"


def clean_text(col: Column | str, max_length: int | None = None) -> Column:
    """Whitespace-normalize + optional truncate-with-ellipsis.

    Reference: utils.py:84-105. Semantics: NULL -> ''; collapse every
    whitespace run (space/tab/newline) to a single space and strip the ends
    (`" ".join(text.split())`); if ``max_length`` is set and the cleaned text
    is longer, truncate to ``max_length`` chars then append ``"..."`` — the
    result is max_length+3 chars (pinned by test_scrapper.py:43-44).
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.coalesce(F.trim(F.regexp_replace(c, WS_RUN, " ")), F.lit(""))
    if max_length is not None:
        cleaned = F.when(
            F.length(cleaned) > max_length,
            F.concat(F.substring(cleaned, 1, max_length), F.lit("...")),
        ).otherwise(cleaned)
    return cleaned


def user_display_name(col: Column | str) -> Column:
    """Coalesce a Jira user struct to a display string.

    Reference: utils.py:108-121 (`displayName` -> `name` -> 'Unknown';
    NULL object -> 'Unknown'), pinned by test_scrapper.py:46-60. The input
    column must be a struct with nullable `displayName` / `name` fields.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.getField("displayName"), c.getField("name"), F.lit("Unknown"))


def parse_jira_timestamp(col: Column | str) -> Column:
    """Parse a Jira ISO-8601 timestamp string to a real TimestampType.

    Deliberate upgrade over the reference's string passthrough
    (utils.py:124-141): Jira emits `2024-01-01T00:00:00.000+0000`
    (fixture at test_scrapper.py:129-130). NULL/empty -> NULL.

    try_to_timestamp, not to_timestamp: under the ANSI-on Spark 4 default
    a malformed or EMPTY string aborts the whole job with
    CANNOT_PARSE_TIMESTAMP — and the silver schema guarantees empty
    strings (extract._ts_string maps a NULL resolutiondate to ''), so
    the strict form crashes on the first unresolved issue.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSZ"))


def sanitize_filename(col: Column | str) -> Column:
    """Replace filesystem-unsafe chars with '_' (reference utils.py:215-228)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, '<>:"/\\|?*', "_________")


def has_required_fields(col: Column | str, required: list[str]) -> Column:
    """Struct-field presence check — the Spark form of the reference's
    validate_json_structure (utils.py:201-213).

    Under a declared read schema an absent JSON field surfaces as NULL, so
    `all(field in data)` becomes an AND of per-field isNotNull on the
    struct. Row-level: malformed envelopes filter out instead of aborting
    the job (the distributed analog of the reference's per-issue skip).
    """
    c = F.col(col) if isinstance(col, str) else col
    cond = F.lit(True)
    for f in required:
        cond = cond & c.getField(f).isNotNull()
    return cond


def backoff_sleep_time(col: Column | str, backoff_factor: int = 2) -> Column:
    """Exponential backoff capped at 60s: min(factor**n, 60).

    Reference: utils.py:144-156, pinned by test_scrapper.py:62-70. Only used
    inside the REST source's retry loop; exposed as a column fn for parity
    testing.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.least(F.pow(F.lit(float(backoff_factor)), c), F.lit(60.0))
