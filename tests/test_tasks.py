"""Golden flatMap tests — fixture issue -> exact example multiset
(FIXTURES.md §2: 6 examples, no issue_resolution since status=Open)."""

from __future__ import annotations

import copy

from apache_jira_scraper_spark.operators.tasks import issues_to_examples
from apache_jira_scraper_spark.schemas import ISSUE
from tests.fixtures import SAMPLE_ISSUE_FIXTURE


def _transform(spark, issue):
    df = spark.createDataFrame([issue], ISSUE)
    return issues_to_examples(df).collect()


def test_golden_six_examples(spark):
    rows = _transform(spark, SAMPLE_ISSUE_FIXTURE)
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["task_type"], []).append(r)

    assert len(rows) == 6
    assert sorted(by_type) == [
        "classification",
        "question_answering",
        "status_prediction",
        "summarization",
    ]
    assert len(by_type["question_answering"]) == 3

    summ = by_type["summarization"][0]
    assert summ["input"] == (
        "Description: This is a test issue\n\nComment 1: Test comment"
    )
    assert summ["output"] == "Test Issue (Status: Open, Priority: Major)"
    assert summ["metadata"]["issue_key"] == "TEST-123"
    assert summ["metadata"]["labels"] == ["test"]
    assert summ["metadata"]["components"] == ["Core"]
    assert summ["metadata"]["question_type"] is None

    cls = by_type["classification"][0]
    assert cls["input"] == "Title: Test Issue\nDescription: This is a test issue"
    assert cls["output"] == "Major"

    sp = by_type["status_prediction"][0]
    assert sp["input"] == (
        "Issue: Test Issue\nType: Bug\nPriority: Major\nDescription: This is a test issue"
    )
    assert sp["output"] == "Open"

    qa = {r["metadata"]["question_type"]: r for r in by_type["question_answering"]}
    assert sorted(qa) == ["assignee", "status", "summary"]
    assert qa["summary"]["input"] == (
        "Issue Key: TEST-123\nTitle: Test Issue\nDescription: This is a test issue"
        "\n\nQuestion: What is this issue about?"
    )
    assert qa["summary"]["output"] == "Test Issue"
    assert qa["status"]["output"] == "Open"
    assert qa["assignee"]["output"] == "Assignee User"


def test_resolution_task_gated_on_status(spark):
    issue = copy.deepcopy(SAMPLE_ISSUE_FIXTURE)
    issue["status"] = "Resolved"
    issue["comments"] = [
        {"author": "a", "created": "", "body": "first"},
        {"author": "b", "created": "", "body": "second"},
        {"author": "c", "created": "", "body": "the fix"},
    ]
    issue["comment_count"] = 3
    rows = _transform(spark, issue)
    res = [r for r in rows if r["task_type"] == "issue_resolution"]
    assert len(res) == 1
    # last 2 comments joined by '\n' (transformer.py:193-194)
    assert res[0]["output"] == "second\nthe fix"
    assert res[0]["input"] == (
        "Issue: Test Issue\nDescription: This is a test issue\n\nHow was this issue resolved?"
    )
    assert len(rows) == 7  # all gates open


def test_unknown_assignee_drops_qa3(spark):
    issue = copy.deepcopy(SAMPLE_ISSUE_FIXTURE)
    issue["assignee"] = "Unknown"
    rows = _transform(spark, issue)
    qa = [r for r in rows if r["task_type"] == "question_answering"]
    assert len(qa) == 2
    assert {r["metadata"]["question_type"] for r in qa} == {"summary", "status"}


def test_empty_issue_still_yields_qa(spark):
    issue = copy.deepcopy(SAMPLE_ISSUE_FIXTURE)
    issue["description"] = ""
    issue["comments"] = []
    issue["comment_count"] = 0
    issue["title"] = ""
    issue["priority"] = ""
    issue["status"] = ""
    issue["assignee"] = "Unknown"
    rows = _transform(spark, issue)
    # gates: no summarization (no desc/comments), no classification (no title),
    # no status_prediction, no qa3, no resolution -> only qa1+qa2
    assert {r["task_type"] for r in rows} == {"question_answering"}
    assert len(rows) == 2


def test_single_comment_resolution_slice(spark):
    # python [-2:] of a 1-element list is the whole list
    issue = copy.deepcopy(SAMPLE_ISSUE_FIXTURE)
    issue["status"] = "Closed"
    rows = _transform(spark, issue)
    res = [r for r in rows if r["task_type"] == "issue_resolution"]
    assert len(res) == 1 and res[0]["output"] == "Test comment"
