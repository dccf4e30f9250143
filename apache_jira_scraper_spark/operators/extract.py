"""Raw Jira envelope -> silver issue projection (SURVEY.md §2.2 P1-P5).

Replicates the effective behavior of the reference's `_extract_issue_data`
(scraper.py:190-259) as a single declarative select over nested columns —
Catalyst prunes unread nested fields at the scan, and everything stays in
whole-stage codegen (no Python in the hot path).

Semantics pinned by the golden extraction test (test_scrapper.py:115-153):
  - title/description/comment bodies whitespace-normalized via clean_text;
    description truncated at 20_000 (+'...'), comments at 10_000 (config.py:43-44)
  - status/priority/issue_type default 'Unknown' (scraper.py:217-219)
  - reporter/assignee coalesce displayName -> name -> 'Unknown' (utils.py:108-121)
  - timestamps kept as ISO strings, NULL -> '' (utils.py:124-141 passthrough)
  - components/versions/fixVersions: array-of-struct -> array of .name
  - comments with empty cleaned body dropped (scraper.py:250);
    comment_count = size(kept comments)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import clean_text, user_display_name
from ..schemas import RAW_COMMENT

MAX_DESCRIPTION_LENGTH = 20_000  # config.py:43
MAX_COMMENT_LENGTH = 10_000  # config.py:44
DEFAULT_JIRA_BASE_URL = "https://issues.apache.org/jira"  # config.py:22


def _names(col: Column) -> Column:
    """array<struct<name:string>> -> array<string> with ''-default, [] when NULL."""
    return F.coalesce(
        F.transform(col, lambda s: F.coalesce(s.getField("name"), F.lit(""))),
        F.array().cast("array<string>"),
    )


def _ts_string(col: Column) -> Column:
    """Reference keeps timestamps as ISO strings; NULL -> ''."""
    return F.coalesce(col, F.lit(""))


def extract_issues(
    raw: DataFrame,
    project: str | None = None,
    base_url: str = DEFAULT_JIRA_BASE_URL,
) -> DataFrame:
    """Project a DataFrame of RAW_ISSUE rows into ISSUE rows.

    ``project`` mirrors the reference's per-scraper project constant
    (scraper.py:203); when None, a `project` column must already exist
    (our engine's multi-project layout — the reference's driver loop
    becomes a partition column, SURVEY §1.1).
    """
    f = F.col("fields")
    project_col = F.lit(project) if project is not None else F.col("project")

    # Kept comments: clean each body first, then drop empties (scraper.py:244-255).
    cleaned_comments = F.filter(
        F.transform(
            # the empty-array fallback's type is DERIVED from the declared
            # schema - a hardcoded DDL copy would make F.coalesce's branch
            # types diverge the moment RAW_COMMENT gains a field
            F.coalesce(
                f.getField("comment").getField("comments"),
                F.array().cast(T.ArrayType(RAW_COMMENT).simpleString()),
            ),
            lambda c: F.struct(
                user_display_name(c.getField("author")).alias("author"),
                _ts_string(c.getField("created")).alias("created"),
                clean_text(c.getField("body"), MAX_COMMENT_LENGTH).alias("body"),
            ),
        ),
        lambda c: c.getField("body") != "",
    )

    return raw.select(
        F.coalesce(F.col("key"), F.lit("")).alias("issue_key"),
        F.coalesce(F.col("id"), F.lit("")).alias("issue_id"),
        project_col.alias("project"),
        F.concat(F.lit(base_url + "/browse/"), F.coalesce(F.col("key"), F.lit(""))).alias("url"),
        clean_text(f.getField("summary")).alias("title"),
        clean_text(f.getField("description"), MAX_DESCRIPTION_LENGTH).alias("description"),
        F.coalesce(f.getField("status").getField("name"), F.lit("Unknown")).alias("status"),
        F.coalesce(f.getField("priority").getField("name"), F.lit("Unknown")).alias("priority"),
        F.coalesce(f.getField("issuetype").getField("name"), F.lit("Unknown")).alias("issue_type"),
        user_display_name(f.getField("reporter")).alias("reporter"),
        user_display_name(f.getField("assignee")).alias("assignee"),
        _ts_string(f.getField("created")).alias("created"),
        _ts_string(f.getField("updated")).alias("updated"),
        _ts_string(f.getField("resolutiondate")).alias("resolved"),
        F.coalesce(f.getField("labels"), F.array().cast("array<string>")).alias("labels"),
        _names(f.getField("components")).alias("components"),
        _names(f.getField("versions")).alias("versions"),
        _names(f.getField("fixVersions")).alias("fix_versions"),
        cleaned_comments.alias("comments"),
        F.size(cleaned_comments).alias("comment_count"),
    )
