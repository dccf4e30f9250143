"""Golden extraction test — mirrors test_scrapper.py:115-153 exactly."""

from __future__ import annotations

from apache_jira_scraper_spark.operators.extract import extract_issues
from apache_jira_scraper_spark.schemas import RAW_ISSUE
from tests.fixtures import RAW_ISSUE_FIXTURE


def _extract_fixture(spark, fixture=RAW_ISSUE_FIXTURE, **kw):
    raw = spark.createDataFrame([fixture], RAW_ISSUE)
    return extract_issues(raw, project="TEST", **kw).collect()[0]


def test_golden_extraction(spark):
    row = _extract_fixture(spark)
    assert row["issue_key"] == "TEST-123"
    assert row["issue_id"] == "12345"
    assert row["project"] == "TEST"
    assert row["title"] == "Test Issue"
    assert row["description"] == "Test description"
    assert row["status"] == "Open"
    assert row["priority"] == "Major"
    assert row["issue_type"] == "Bug"
    assert row["reporter"] == "Reporter User"
    assert row["assignee"] == "Assignee User"
    assert row["created"] == "2024-01-01T00:00:00.000+0000"
    assert row["resolved"] == ""  # NULL resolutiondate -> '' (utils.py:138-139)
    assert row["labels"] == ["test", "bug"]
    assert row["components"] == ["Core"]
    assert row["versions"] == []  # NULL array -> [] (dict .get default)
    assert row["fix_versions"] == []
    assert row["comment_count"] == 1
    assert len(row["comments"]) == 1
    c = row["comments"][0]
    assert c["author"] == "Commenter" and c["body"] == "Test comment"
    assert row["url"].endswith("/browse/TEST-123")


def test_unknown_defaults_and_empty_comment_drop(spark):
    fixture = {
        "key": "TEST-1",
        "id": "1",
        "fields": {
            "summary": "  padded   title ",
            "description": None,
            "status": None,
            "priority": None,
            "issuetype": None,
            "reporter": None,
            "assignee": {"displayName": None, "name": "fallback"},
            "created": None,
            "updated": None,
            "resolutiondate": None,
            "labels": None,
            "components": [],
            "versions": [],
            "fixVersions": [],
            "comment": {
                "comments": [
                    {"author": None, "created": None, "body": "   \n\t  "},  # empty after clean
                    {"author": None, "created": None, "body": " kept  comment "},
                ]
            },
        },
    }
    row = _extract_fixture(spark, fixture)
    assert row["title"] == "padded title"  # clean_text whitespace collapse
    assert row["description"] == ""
    assert row["status"] == "Unknown"  # scraper.py:217-219 defaults
    assert row["priority"] == "Unknown"
    assert row["issue_type"] == "Unknown"
    assert row["reporter"] == "Unknown"  # NULL user -> Unknown
    assert row["assignee"] == "fallback"  # displayName NULL -> name
    assert row["created"] == ""
    assert row["labels"] == []
    # scraper.py:250: comment with whitespace-only body dropped post-clean
    assert row["comment_count"] == 1
    assert row["comments"][0]["body"] == "kept comment"
    assert row["comments"][0]["author"] == "Unknown"
