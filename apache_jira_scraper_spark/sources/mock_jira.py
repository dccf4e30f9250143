"""In-process mock Jira REST server for data-source tests.

Serves /rest/api/2/search with startAt/maxResults pagination over a
deterministic corpus (the reference's fixture issue, templated), and can
inject one-shot 429/500 responses to exercise the retry envelope
(mirrors test_scrapper.py:91-113's mocked-session strategy, but over a real
socket so the whole DataSource stack runs).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def make_issue(project: str, i: int) -> dict:
    resolved = i % 3 == 0
    return {
        "key": f"{project}-{i}",
        "id": str(10_000 + i),
        "fields": {
            "summary": f"Issue {i} of {project}",
            "description": f"Description   body {i}" if i % 7 else "",
            "status": {"name": "Resolved" if resolved else "Open"},
            "priority": {"name": ["Blocker", "Critical", "Major", "Minor", "Trivial"][i % 5]},
            "issuetype": {"name": ["Bug", "Task", "Improvement"][i % 3]},
            "reporter": {"displayName": f"Reporter {i % 10}"},
            "assignee": {"displayName": f"Assignee {i % 7}"} if i % 5 else None,
            "created": f"2024-01-{(i % 28) + 1:02d}T00:00:00.000+0000",
            "updated": f"2024-02-{(i % 28) + 1:02d}T00:00:00.000+0000",
            "resolutiondate": f"2024-03-{(i % 28) + 1:02d}T00:00:00.000+0000" if resolved else None,
            "labels": [f"label{i % 4}"],
            "components": [{"name": f"comp{i % 3}"}],
            "versions": [],
            "fixVersions": [],
            "comment": {
                "comments": [
                    {
                        "author": {"displayName": f"Commenter {j}"},
                        "created": f"2024-04-{(j % 28) + 1:02d}T00:00:00.000+0000",
                        "body": f"Comment {j} on {project}-{i}",
                    }
                    for j in range(i % 4)
                ]
            },
        },
    }


class MockJira:
    def __init__(
        self,
        totals: dict[str, int],
        clamp: int | None = None,
        lie_echo: bool = False,
    ):
        self.totals = totals
        self.requests: list[dict] = []
        self.fail_once: dict[int, int] = {}  # request_index -> status code
        # Jira Cloud contract knobs: `clamp` caps the EFFECTIVE maxResults
        # below what the client requested (Cloud caps search at 100) and is
        # echoed in the response body like the real server; `totals_after`
        # = (request_index, new_totals) swaps the advertised totals once
        # that many requests have been served — the mid-scan mutation case.
        self.clamp = clamp
        # lie_echo: echo the REQUESTED maxResults while still clamping the
        # page — the third-party-server behavior the reader must survive
        # without row loss (it may only trust an echo that is < request)
        self.lie_echo = lie_echo
        self.totals_after: tuple[int, dict[str, int]] | None = None
        self._lock = threading.Lock()

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802
                pass

            def do_GET(self):  # noqa: N802
                parsed = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(parsed.query).items()}
                with outer._lock:
                    idx = len(outer.requests)
                    outer.requests.append(q)
                    fail = outer.fail_once.pop(idx, None)
                if fail:
                    self.send_response(fail)
                    if fail == 429:
                        self.send_header("Retry-After", "0")
                    self.end_headers()
                    return
                jql = q.get("jql", "")
                project = jql.split("=")[1].split("ORDER")[0].strip() if "=" in jql else "?"
                totals = outer.totals
                if outer.totals_after is not None and idx >= outer.totals_after[0]:
                    totals = outer.totals_after[1]
                total = totals.get(project, 0)
                start = int(q.get("startAt", 0))
                n = int(q.get("maxResults", 50))
                eff = min(n, outer.clamp) if outer.clamp else n
                issues = [make_issue(project, i) for i in range(start, min(start + eff, total))]
                echo = n if outer.lie_echo else eff
                body = json.dumps(
                    {"total": total, "startAt": start, "maxResults": echo, "issues": issues}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.server.server_port}"

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *a):
        self.server.shutdown()
        self.server.server_close()
