"""Directed tests for io.session_cached — the silver-table memoization
every gate-level cache (shingle index, pair tables, phash tables,
clusters leg, landing dirs) rides on. Until r09 it had no tests of its
own; the review-found race (two concurrent first calls both running the
builder, the loser's checkpoints leaking) is pinned here against the
process-wide RLock fix."""

from __future__ import annotations

import threading
import time

from apache_jira_scraper_spark.io import session_cached


def test_session_cached_memoizes_and_keys_by_app(spark):
    cache: dict = {}
    builds = []

    def build():
        builds.append(1)
        return object()

    got1 = session_cached(cache, spark, ("k",), build)
    got2 = session_cached(cache, spark, ("k",), build)
    assert got1 is got2 and len(builds) == 1
    # a different extra_key builds separately
    session_cached(cache, spark, ("other",), build)
    assert len(builds) == 2
    # entries from a DEAD application are evicted on the next miss: they
    # reference stopped contexts whose checkpoint blocks are gone
    cache[("dead-app", "stale")] = object()
    session_cached(cache, spark, ("third",), build)
    assert ("dead-app", "stale") not in cache
    app = spark.sparkContext.applicationId
    assert all(k[0] == app for k in cache)


def test_session_cached_concurrent_first_calls_build_once(spark):
    """Review r09: without the lock, two threads racing a cold cache both
    ran the builder and the losing eager checkpoints leaked. With a slow
    builder and a barrier start, exactly ONE build must run and every
    thread must get the same object."""
    cache: dict = {}
    builds = []
    barrier = threading.Barrier(4)
    results = []

    def build():
        builds.append(1)
        time.sleep(0.3)  # widen the race window
        return object()

    def worker():
        barrier.wait()
        results.append(session_cached(cache, spark, ("race",), build))

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1, f"builder ran {len(builds)} times"
    assert len(results) == 4 and all(r is results[0] for r in results)


def test_session_cached_reentrant_builder(spark):
    """Cached builders may consult another session cache (e.g. a pair
    table builder reading the cached embedding projection) — the lock is
    re-entrant, so a nested call from inside a builder must not
    deadlock."""
    outer: dict = {}
    inner: dict = {}

    def build_inner():
        return "inner-value"

    def build_outer():
        return session_cached(inner, spark, ("i",), build_inner) + "+outer"

    assert session_cached(outer, spark, ("o",), build_outer) == "inner-value+outer"
    assert len(inner) == 1 and len(outer) == 1
