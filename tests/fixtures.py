"""Reference fixture literals (test_scrapper.py:118-143 and :165-192),
ported verbatim so our golden tests pin the same semantics."""

from __future__ import annotations

# Raw API issue — test_scrapper.py:118-143 (golden extraction input)
RAW_ISSUE_FIXTURE = {
    "key": "TEST-123",
    "id": "12345",
    "fields": {
        "summary": "Test Issue",
        "description": "Test description",
        "status": {"name": "Open"},
        "priority": {"name": "Major"},
        "issuetype": {"name": "Bug"},
        "reporter": {"displayName": "Reporter User", "name": None},
        "assignee": {"displayName": "Assignee User", "name": None},
        "created": "2024-01-01T00:00:00.000+0000",
        "updated": "2024-01-02T00:00:00.000+0000",
        "resolutiondate": None,
        "labels": ["test", "bug"],
        "components": [{"name": "Core"}],
        "versions": None,
        "fixVersions": None,
        "comment": {
            "comments": [
                {
                    "author": {"displayName": "Commenter", "name": None},
                    "created": "2024-01-03T00:00:00.000+0000",
                    "body": "Test comment",
                }
            ]
        },
    },
}

# Extracted issue — test_scrapper.py:165-192 (flatMap golden input)
SAMPLE_ISSUE_FIXTURE = {
    "issue_key": "TEST-123",
    "issue_id": "12345",
    "project": "TEST",
    "url": "http://test.com/TEST-123",
    "title": "Test Issue",
    "description": "This is a test issue",
    "status": "Open",
    "priority": "Major",
    "issue_type": "Bug",
    "reporter": "Reporter User",
    "assignee": "Assignee User",
    "created": "2024-01-01T00:00:00.000+0000",
    "updated": "2024-01-02T00:00:00.000+0000",
    "resolved": "",
    "labels": ["test"],
    "components": ["Core"],
    "versions": [],
    "fix_versions": [],
    "comments": [
        {
            "author": "Commenter",
            "created": "2024-01-03T00:00:00.000+0000",
            "body": "Test comment",
        }
    ],
    "comment_count": 1,
}
