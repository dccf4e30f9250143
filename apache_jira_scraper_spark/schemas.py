"""Declared schemas for the Jira pipeline (SURVEY.md §1.2).

The reference's types are implicit dicts; here every zone has a fixed,
declared StructType — schema inference happens only at the ingest boundary.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str, typ: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, typ, nullable)


USER = T.StructType([_s("displayName", T.StringType()), _s("name", T.StringType())])
NAMED = T.StructType([_s("name", T.StringType())])

RAW_COMMENT = T.StructType(
    [_s("author", USER), _s("created", T.StringType()), _s("body", T.StringType())]
)

# Raw Jira API issue envelope (FIXTURES.md §1; consumed at scraper.py:200)
RAW_ISSUE = T.StructType(
    [
        _s("key", T.StringType()),
        _s("id", T.StringType()),
        _s(
            "fields",
            T.StructType(
                [
                    _s("summary", T.StringType()),
                    _s("description", T.StringType()),
                    _s("status", NAMED),
                    _s("priority", NAMED),
                    _s("issuetype", NAMED),
                    _s("reporter", USER),
                    _s("assignee", USER),
                    _s("created", T.StringType()),
                    _s("updated", T.StringType()),
                    _s("resolutiondate", T.StringType()),
                    _s("labels", T.ArrayType(T.StringType())),
                    _s("components", T.ArrayType(NAMED)),
                    _s("versions", T.ArrayType(NAMED)),
                    _s("fixVersions", T.ArrayType(NAMED)),
                    _s(
                        "comment",
                        T.StructType([_s("comments", T.ArrayType(RAW_COMMENT))]),
                    ),
                ]
            ),
        ),
    ]
)

COMMENT = T.StructType(
    [_s("author", T.StringType()), _s("created", T.StringType()), _s("body", T.StringType())]
)

# Silver issue record (scraper.py:190-259's output shape, FIXTURES.md §2)
ISSUE = T.StructType(
    [
        _s("issue_key", T.StringType()),
        _s("issue_id", T.StringType()),
        _s("project", T.StringType()),
        _s("url", T.StringType()),
        _s("title", T.StringType()),
        _s("description", T.StringType()),
        _s("status", T.StringType()),
        _s("priority", T.StringType()),
        _s("issue_type", T.StringType()),
        _s("reporter", T.StringType()),
        _s("assignee", T.StringType()),
        _s("created", T.StringType()),
        _s("updated", T.StringType()),
        _s("resolved", T.StringType()),
        _s("labels", T.ArrayType(T.StringType())),
        _s("components", T.ArrayType(T.StringType())),
        _s("versions", T.ArrayType(T.StringType())),
        _s("fix_versions", T.ArrayType(T.StringType())),
        _s("comments", T.ArrayType(COMMENT)),
        _s("comment_count", T.IntegerType()),
    ]
)

# Gold training-example record (transformer.py:54-64 and siblings; FIXTURES.md §3).
# metadata is a fixed struct (not MapType): the reference's ragged dict keys are
# the union of base keys (transformer.py:228-238) + question_type (QA only) —
# a closed set, so a typed struct beats a map for columnar pruning at scale.
EXAMPLE_METADATA = T.StructType(
    [
        _s("issue_key", T.StringType()),
        _s("project", T.StringType()),
        _s("issue_type", T.StringType()),
        _s("priority", T.StringType()),
        _s("status", T.StringType()),
        _s("created", T.StringType()),
        _s("url", T.StringType()),
        _s("labels", T.ArrayType(T.StringType())),
        _s("components", T.ArrayType(T.StringType())),
        _s("question_type", T.StringType()),
    ]
)

EXAMPLE = T.StructType(
    [
        _s("task_type", T.StringType()),
        _s("instruction", T.StringType()),
        _s("input", T.StringType()),
        _s("output", T.StringType()),
        _s("metadata", EXAMPLE_METADATA),
    ]
)
