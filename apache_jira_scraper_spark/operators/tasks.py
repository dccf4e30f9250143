"""Issue -> training-example flatMap (SURVEY.md §2.10 D2).

The reference's `transform_issue` (transformer.py:214-274) maps one issue to
up to 7 examples. Here it is pure native column algebra: build an array of
the candidate task structs with `when()` gates, `explode` it, drop NULLs.
No Python runs per row — at 100 TB this is the difference between a codegen'd
narrow stage and a serialized Python round-trip.

Gates replicated exactly (truthiness of Python strings == "non-empty"):
  summarization    description != '' OR has comments        transformer.py:241
  classification   title != '' AND priority != ''           transformer.py:247
  status_prediction title != '' AND status != ''            transformer.py:253
  qa summary/status ungated                                 transformer.py:135-160
  qa assignee      assignee != '' AND assignee != 'Unknown' transformer.py:163
  issue_resolution has comments AND status IN               transformer.py:189
                   ('Resolved','Closed')
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TASK_TYPES = (
    "summarization",
    "classification",
    "status_prediction",
    "question_answering",
    "issue_resolution",
)

_INSTRUCTIONS = {
    "summarization": "Summarize the following software issue and its discussion:",
    "classification": "Classify the priority of this software issue (Blocker, Critical, Major, Minor, Trivial):",
    "status_prediction": "Predict the current status of this software issue:",
    "question_answering": "Answer the following question about this software issue:",
    "issue_resolution": "Based on the issue discussion, explain how this issue was resolved:",
}


def _truthy(col: Column) -> Column:
    return col.isNotNull() & (col != "")


def _metadata(question_type: Column | None = None) -> Column:
    """Base metadata struct shared by every task (transformer.py:228-238),
    plus the QA-only question_type (transformer.py:143,157,172)."""
    qt = question_type if question_type is not None else F.lit(None).cast("string")
    return F.struct(
        F.col("issue_key").alias("issue_key"),
        F.col("project").alias("project"),
        F.col("issue_type").alias("issue_type"),
        F.col("priority").alias("priority"),
        F.col("status").alias("status"),
        F.col("created").alias("created"),
        F.col("url").alias("url"),
        F.col("labels").alias("labels"),
        F.col("components").alias("components"),
        qt.alias("question_type"),
    )


def _example(task_type: str, input_col: Column, output_col: Column,
             question_type: str | None = None, include_content: bool = True) -> Column:
    if not include_content:
        # Hand nested-column pruning: gate semantics (row existence) never
        # depend on input/output content, so count-only consumers skip the
        # string assembly entirely — Catalyst cannot prune through a
        # Generate of freshly-constructed structs.
        input_col = F.lit("")
        output_col = F.lit("")
    return F.struct(
        F.lit(task_type).alias("task_type"),
        F.lit(_INSTRUCTIONS[task_type]).alias("instruction"),
        input_col.alias("input"),
        output_col.alias("output"),
        _metadata(F.lit(question_type) if question_type else None).alias("metadata"),
    )


def _gated(gate: Column, example: Column) -> Column:
    return F.when(gate, example)


def comment_digests(issues: DataFrame) -> DataFrame:
    """Scalar digests of the `comments` array — the ONLY projections the
    example flatMap reads (first-3 formatted block, last-2 body block).

    Precomputing these lets a silver/materialized issues table drop the
    nested array<struct> column entirely: the digests are plain strings,
    far cheaper to materialize and scan than the array, and at 100 TB the
    silver parquet then stores two short strings instead of every comment
    body twice. NULL (not '') when an issue has no comments, so a
    downstream concat_ws skips the block exactly like the absent-array
    case (and like SQL string_agg over zero rows)."""
    has = F.size("comments") > 0
    first3 = F.concat_ws(
        "\n\n",
        F.transform(
            F.slice("comments", 1, 3),
            lambda c, i: F.concat(
                F.lit("Comment "), (i + 1).cast("string"), F.lit(": "), c.getField("body")
            ),
        ),
    )
    last2_arr = F.when(F.size("comments") <= 2, F.col("comments")).otherwise(
        F.slice("comments", -2, 2)
    )
    last2 = F.concat_ws("\n", F.transform(last2_arr, lambda c: c.getField("body")))
    return issues.withColumn("first3_block", F.when(has, first3)).withColumn(
        "last2_block", F.when(has, last2)
    )


def issues_to_examples(issues: DataFrame, include_content: bool = True) -> DataFrame:
    """Transform an ISSUE DataFrame into an EXAMPLE DataFrame (the flatMap).

    ``include_content=False`` keeps row multiplicity and metadata identical
    but emits empty input/output — for aggregate-only consumers (see
    _example's pruning note)."""
    def _ex(task_type, input_col, output_col, question_type=None):
        return _example(task_type, input_col, output_col, question_type, include_content)

    if "first3_block" not in issues.columns:
        # library callers hand raw issues with the comments array; gate
        # queries hand the silver form with the digests already materialized
        issues = comment_digests(issues)
    desc = F.col("description")
    has_desc = _truthy(desc)
    has_comments = (
        F.size("comments") > 0
        if "comments" in issues.columns
        else F.col("comment_count") > 0
    )
    desc500 = F.substring(desc, 1, 500)

    # -- summarization (transformer.py:32-64): description + first 3 comments
    summarization = _gated(
        has_desc | has_comments,
        _ex(
            "summarization",
            F.concat_ws(
                "\n\n",
                F.when(has_desc, F.concat(F.lit("Description: "), desc)),
                F.col("first3_block"),
            ),
            F.concat(
                F.col("title"), F.lit(" (Status: "), F.col("status"),
                F.lit(", Priority: "), F.col("priority"), F.lit(")"),
            ),
        ),
    )

    # -- classification (transformer.py:66-91): plain [:500] slice, no ellipsis
    classification = _gated(
        _truthy(F.col("title")) & _truthy(F.col("priority")),
        _ex(
            "classification",
            F.concat(
                F.lit("Title: "), F.col("title"), F.lit("\n"),
                F.when(has_desc, F.concat(F.lit("Description: "), desc500)).otherwise(F.lit("")),
            ),
            F.col("priority"),
        ),
    )

    # -- status prediction (transformer.py:93-120)
    status_prediction = _gated(
        _truthy(F.col("title")) & _truthy(F.col("status")),
        _ex(
            "status_prediction",
            F.concat(
                F.lit("Issue: "), F.col("title"), F.lit("\n"),
                F.lit("Type: "), F.col("issue_type"), F.lit("\n"),
                F.lit("Priority: "), F.col("priority"), F.lit("\n"),
                F.when(has_desc, F.concat(F.lit("Description: "), desc500)).otherwise(F.lit("")),
            ),
            F.col("status"),
        ),
    )

    # -- QA tasks (transformer.py:122-177); Q1/Q2 ungated, Q3 assignee-gated
    qa_summary = _ex(
        "question_answering",
        F.concat(
            F.lit("Issue Key: "), F.col("issue_key"),
            F.lit("\nTitle: "), F.col("title"),
            F.lit("\nDescription: "), F.coalesce(desc, F.lit("N/A")),
            F.lit("\n\nQuestion: What is this issue about?"),
        ),
        F.col("title"),
        question_type="summary",
    )
    qa_status = _ex(
        "question_answering",
        F.concat(
            F.lit("Issue Key: "), F.col("issue_key"),
            F.lit("\nTitle: "), F.col("title"),
            F.lit("\n\nQuestion: What is the current status of this issue?"),
        ),
        F.col("status"),
        question_type="status",
    )
    qa_assignee = _gated(
        _truthy(F.col("assignee")) & (F.col("assignee") != "Unknown"),
        _ex(
            "question_answering",
            F.concat(
                F.lit("Issue Key: "), F.col("issue_key"),
                F.lit("\nTitle: "), F.col("title"),
                F.lit("\n\nQuestion: Who is assigned to this issue?"),
            ),
            F.col("assignee"),
            question_type="assignee",
        ),
    )

    # -- issue resolution (transformer.py:179-212): last 2 comment bodies,
    # joined by '\n', sliced to 500 chars (plain slice)
    resolution_context = F.coalesce(F.col("last2_block"), F.lit(""))
    issue_resolution = _gated(
        has_comments & F.col("status").isin("Resolved", "Closed"),
        _ex(
            "issue_resolution",
            F.concat(
                F.lit("Issue: "), F.col("title"), F.lit("\n"),
                F.when(has_desc, F.concat(F.lit("Description: "), desc500, F.lit("\n"))).otherwise(F.lit("")),
                F.lit("\nHow was this issue resolved?"),
            ),
            F.substring(resolution_context, 1, 500),
        ),
    )

    candidates = F.array(
        summarization,
        classification,
        status_prediction,
        qa_summary,
        qa_status,
        qa_assignee,
        issue_resolution,
    )
    return (
        issues.select(F.explode(candidates).alias("example"))
        .filter(F.col("example").isNotNull())
        .select("example.*")
    )
