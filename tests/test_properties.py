"""Property-based tests (hypothesis): the engine's column functions against
pure-Python models of the reference's semantics (SURVEY.md §5 upgrade — the
reference has example-based tests only; these pin the same behavior over the
whole ASCII input space).

Batched execution: each hypothesis example is a LIST of inputs run through
one Spark job, so the example budget buys thousands of row-level checks.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apache_jira_scraper_spark.functions import (
    backoff_sleep_time,
    clean_text,
    sanitize_filename,
    user_display_name,
)
from apache_jira_scraper_spark.operators.tasks import issues_to_examples

# ASCII incl. every whitespace char both Python str.split() and Java \s treat
# identically (space, \t, \n, \r, \x0b, \x0c)
_ASCII = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E)
    | st.sampled_from("\t\n\r\x0b\x0c"),
    max_size=80,
)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_clean(text: str | None, max_length: int | None = None) -> str:
    """The reference model: utils.py:84-105 effective behavior."""
    if not text:
        return ""
    cleaned = " ".join(text.split())
    if max_length and len(cleaned) > max_length:
        cleaned = cleaned[:max_length] + "..."
    return cleaned


@settings(**_SETTINGS)
@given(st.lists(st.one_of(st.none(), _ASCII), min_size=1, max_size=60))
def test_clean_text_matches_python_model(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [
        (r["plain"], r["capped"])
        for r in df.select(
            clean_text(F.col("t")).alias("plain"),
            clean_text(F.col("t"), 20).alias("capped"),
        ).collect()
    ]
    want = [(_py_clean(t), _py_clean(t, 20)) for t in texts]
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), _ASCII.filter(lambda s: s != "")),
            st.one_of(st.none(), _ASCII.filter(lambda s: s != "")),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_user_display_name_coalesce_chain(spark, users):
    df = spark.createDataFrame(
        [((d, n),) for d, n in users],
        "u struct<displayName:string,name:string>",
    )
    got = [r[0] for r in df.select(user_display_name(F.col("u"))).collect()]
    want = [d or n or "Unknown" for d, n in users]
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=40))
def test_backoff_cap_matches_reference(spark, attempts):
    df = spark.createDataFrame([(a,) for a in attempts], "a int")
    got = [r[0] for r in df.select(backoff_sleep_time(F.col("a"))).collect()]
    want = [float(min(2**a, 60)) for a in attempts]
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(_ASCII, min_size=1, max_size=40))
def test_sanitize_filename_model(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "n string")
    got = [r[0] for r in df.select(sanitize_filename(F.col("n"))).collect()]
    want = ["".join("_" if c in '<>:"/\\|?*' else c for c in n) for n in names]
    assert got == want


# ---------------------------------------------------------------------------
# flatMap gate multiplicity (D2): engine row counts == reference model counts
# ---------------------------------------------------------------------------

_STATUSES = st.sampled_from(["Open", "Resolved", "Closed", "In Progress", "Unknown", ""])
_WORD = st.text(alphabet=st.characters(min_codepoint=0x61, max_codepoint=0x7A), max_size=8)


def _expected_task_count(title, desc, status, priority, assignee, n_comments) -> int:
    n = 0
    if desc or n_comments > 0:
        n += 1  # summarization (transformer.py:241)
    if title and priority:
        n += 1  # classification (:247)
    if title and status:
        n += 1  # status_prediction (:253)
    n += 2  # qa summary + qa status, ungated (transformer.py:135-160)
    if assignee and assignee != "Unknown":
        n += 1  # qa assignee (:163)
    if n_comments > 0 and status in ("Resolved", "Closed"):
        n += 1  # issue_resolution (:189)
    return n


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(_WORD, _WORD, _STATUSES, _WORD, _WORD, st.integers(0, 5)),
        min_size=1,
        max_size=30,
    )
)
def test_flatmap_multiplicity_matches_gate_model(spark, issues):
    rows = []
    for i, (title, desc, status, priority, assignee, n_comments) in enumerate(issues):
        comments = [(f"a{j}", f"2024-01-0{j % 9 + 1}", f"body {j}") for j in range(n_comments)]
        rows.append(
            (
                f"K-{i}", str(i), "PROJ", f"http://x/K-{i}", title, desc, status,
                priority, "Bug", "rep", assignee, "2024-01-01", "2024-01-02", "",
                [], [], [], [], comments, n_comments,
            )
        )
    schema = (
        "issue_key string, issue_id string, project string, url string, title string,"
        " description string, status string, priority string, issue_type string,"
        " reporter string, assignee string, created string, updated string,"
        " resolved string, labels array<string>, components array<string>,"
        " versions array<string>, fix_versions array<string>,"
        " comments array<struct<author:string,created:string,body:string>>,"
        " comment_count int"
    )
    df = spark.createDataFrame(rows, schema)
    got = (
        issues_to_examples(df)
        .groupBy(F.col("metadata").getField("issue_key").alias("k"))
        .count()
        .collect()
    )
    got_counts = {r["k"]: r["count"] for r in got}
    for i, (title, desc, status, priority, assignee, n_comments) in enumerate(issues):
        want = _expected_task_count(title, desc, status, priority, assignee, n_comments)
        assert got_counts.get(f"K-{i}", 0) == want, (i, issues[i])


def _py_shingles(text: str) -> set[str]:
    t = text.split(" ")  # exact split-on-space, NOT str.split()
    return {" ".join(t[i : i + 3]) for i in range(max(len(t) - 2, 0))}


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E),
            min_size=0,
            max_size=8,
        ).map(lambda w: w or "x"),
        min_size=0,
        max_size=12,
    )
)
def test_shingles_match_python_model(spark, words):
    """dedup._shingles over arbitrary token lists — including the 0/1/2-token
    docs where Spark's descending sequence(1, 0) used to crash the
    generator (round-3 guard)."""
    from apache_jira_scraper_spark.operators.dedup import _shingles

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    got = set(df.select(_shingles().alias("s")).first()["s"])
    assert got == _py_shingles(text)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=50, unique=True),
    st.integers(min_value=0, max_value=1_000_000),
    st.integers(min_value=0, max_value=1_000_000),
)
def test_deterministic_sample_pure_function_of_key(spark, keys, r1, r2):
    """Membership is a pure per-key hash gate: python-side md5 replication
    predicts the exact sample, and rate-nesting holds for ANY rate pair."""
    import hashlib

    from apache_jira_scraper_spark.operators.corpus import deterministic_sample

    lo, hi = sorted((r1, r2))
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")

    def model(rate):
        return {
            k
            for k in keys
            if int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 1_000_000 < rate
        }

    got_lo = {r["doc_id"] for r in deterministic_sample(df, lo).collect()}
    got_hi = {r["doc_id"] for r in deterministic_sample(df, hi).collect()}
    assert got_lo == model(lo)
    assert got_hi == model(hi)
    assert got_lo <= got_hi


def _py_chunks(words: list[str], chunk: int, overlap: int) -> list[list[str]]:
    """Pure-Python model of chunk_documents' window arithmetic."""
    stride = chunk - overlap
    n = len(words)
    if n <= chunk:
        return [words]
    n_chunks = -((n - chunk) // -stride) + 1
    return [words[i * stride : i * stride + chunk] for i in range(n_chunks)]


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=25),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=0, max_value=6),
)
def test_chunk_documents_matches_python_model(spark, doc_lens, chunk, overlap):
    """Every doc length x (chunk, overlap) combo: same windows as the model,
    full coverage (every token appears), and only the final window short."""
    from apache_jira_scraper_spark.operators.corpus import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    rows = [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(doc_lens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, list[tuple[int, str]]] = {}
    for r in chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    for i, n in enumerate(doc_lens):
        words = [f"t{j}" for j in range(n)]
        expect = _py_chunks(words, chunk, overlap)
        chunks = [t.split(" ") for _, t in sorted(got[i])]
        assert chunks == expect, (n, chunk, overlap)
        assert set().union(*map(set, chunks)) == set(words)
        assert all(len(c) == chunk for c in chunks[:-1]) or n <= chunk


def _py_substring_dedup(docs: dict[int, list[str]], span: int) -> dict[int, list[str]]:
    """Pure-Python model of exact_substring_dedup's remove-all semantics."""
    from collections import Counter

    grams = Counter()
    for words in docs.values():
        for s in range(len(words) - span + 1):
            grams[tuple(words[s : s + span])] += 1
    out = {}
    for d, words in docs.items():
        cov = set()
        for s in range(len(words) - span + 1):
            if grams[tuple(words[s : s + span])] >= 2:
                cov.update(range(s, s + span))
        out[d] = [w for i, w in enumerate(words) if i not in cov]
    return out


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=14),
        min_size=2,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_exact_substring_dedup_matches_python_model(spark, token_lists, span):
    """Tiny alphabet forces frequent shared spans; every doc's cleaned
    token sequence must equal the remove-all model's."""
    from apache_jira_scraper_spark.operators.dedup import exact_substring_dedup

    docs = {i: words for i, words in enumerate(token_lists)}
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["cleaned_text"].split(" ") if r["cleaned_text"] else [])
        for r in exact_substring_dedup(df, span=span).collect()
    }
    expect = _py_substring_dedup(docs, span)
    assert got == expect, (token_lists, span)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(2, 20)),
        min_size=4,
        max_size=30,
    ),
    st.integers(min_value=10, max_value=400),
)
def test_mix_corpus_matches_python_model(spark, rows, budget):
    """mix_corpus membership equals the Python restatement of the rate
    formula + hash gate for every (source, doc-size) corpus shape."""
    import hashlib

    from apache_jira_scraper_spark.operators.corpus import mix_corpus

    weights = {"a": 500_000, "b": 300_000}  # c unlisted -> dropped
    docs = [(i, src, " ".join(f"w{j}" for j in range(n))) for i, (src, n) in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {r["doc_id"] for r in mix_corpus(df, weights, budget).collect()}

    totals: dict[str, int] = {}
    for _, src, text in docs:
        totals[src] = totals.get(src, 0) + len(text.split(" "))
    expect = set()
    for i, src, text in docs:
        w = weights.get(src, 0)
        rate = min(1_000_000, (budget * w) // totals[src])
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1_000_000
        if h < rate:
            expect.add(i)
    assert got == expect, (rows, budget)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1e3,
                max_value=1e3,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=1,
            max_size=16,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_quantize_matches_python_model(spark, vecs):
    """quantize_embeddings equals the pure-Python floor(+0.5) model
    code-for-code over arbitrary finite float32 vectors (the engine-exact
    rounding contract the module docstring claims)."""
    from apache_jira_scraper_spark.operators.quantize import (
        quantize_embeddings,
        quantize_model,
    )

    # pad to one shared dim: Spark columns are rectangular per-row arrays
    dim = max(len(v) for v in vecs)
    vecs = [v + [0.0] * (dim - len(v)) for v in vecs]
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id bigint, e array<double>, label int",
    )
    got = {
        r["vec_id"]: (list(r["qv"]), r["scale"])
        for r in quantize_embeddings(df).collect()
    }
    for i, v in enumerate(vecs):
        codes, scale = quantize_model(v)
        assert got[i][0] == codes, f"vec {i}: {v}"
        assert got[i][1] == pytest.approx(scale, rel=1e-12)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),      # user_id
            st.integers(min_value=0, max_value=50),     # minute offset
            st.sampled_from(["signup", "view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_funnel_matches_python_model(spark, events):
    """The single-shuffle fold equals a pure-Python sequential-min
    simulator over arbitrary event sets — including duplicate timestamps,
    out-of-order arrivals, and steps interleaved across users (the cases
    the real-data oracle can't systematically cover)."""
    import datetime as dt

    from apache_jira_scraper_spark.operators.events import FUNNEL_STEPS, funnel

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (u, t0 + dt.timedelta(minutes=m), et) for u, m, et in events
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")

    # python model: sequential min, strictly-after
    per_user: dict[int, list] = {}
    for u, ts, et in rows:
        per_user.setdefault(u, []).append((ts, et))
    def stage(evs):
        t_last, s = None, 0
        for step in FUNNEL_STEPS:
            cand = [ts for ts, et in evs if et == step and (t_last is None or ts > t_last)]
            if not cand:
                break
            t_last = min(cand)
            s += 1
        return s
    stages = [stage(evs) for evs in per_user.values()]
    expected = {
        i + 1: sum(1 for s in stages if s >= i + 1) for i in range(len(FUNNEL_STEPS))
    }

    got = {r["step_idx"]: r["n_users"] for r in funnel(df).collect()}
    assert got == expected


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),       # user_id
            st.integers(min_value=-20, max_value=40),    # day offset
            st.sampled_from(["signup", "view", "purchase"]),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_retention_matches_python_model(spark, events):
    """retention_cohorts equals a pure-Python cohort simulator over
    arbitrary event sets — pre-signup activity excluded, never-signed-up
    users excluded, integer-ppm retention."""
    import datetime as dt

    from apache_jira_scraper_spark.operators.events import retention_cohorts

    mon = dt.datetime(2025, 1, 6)  # a Monday anchor
    rows = [(u, mon + dt.timedelta(days=d), et) for u, d, et in events]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")

    def week_of(ts):
        d = ts.date()
        return d - dt.timedelta(days=d.weekday())

    cohort: dict[int, dt.date] = {}
    for u, ts, et in rows:
        if et == "signup":
            w = week_of(ts)
            if u not in cohort or w < cohort[u]:
                cohort[u] = w
    active: set = set()
    for u, ts, _ in rows:
        if u in cohort:
            age = (week_of(ts) - cohort[u]).days // 7
            if age >= 0:
                active.add((cohort[u], age, u))
    sizes: dict = {}
    for u, cw in cohort.items():
        sizes[cw] = sizes.get(cw, 0) + 1
    per: dict = {}
    for cw, age, _u in active:
        per[(cw, age)] = per.get((cw, age), 0) + 1
    expected = {
        (cw.isoformat(), age): (sizes[cw], n, n * 1_000_000 // sizes[cw])
        for (cw, age), n in per.items()
    }

    got = {
        (r["cohort_week"].isoformat(), r["age_weeks"]): (
            r["cohort_size"], r["n_active"], r["retention_ppm"]
        )
        for r in retention_cohorts(df).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=12),
        min_size=2,
        max_size=14,
        unique=True,
    )
)
def test_fuzzy_join_matches_python_bruteforce(spark, strings):
    """fuzzy_string_join equals a pure-Python Levenshtein brute force over
    random short strings — the regime where the overlapping blocking
    tiers (q-gram / character / residual) all interact; any recall hole
    at a tier boundary shows up here."""
    from apache_jira_scraper_spark.operators.relational import fuzzy_string_join

    def lev(s1: str, s2: str) -> int:
        prev = list(range(len(s2) + 1))
        for i, c1 in enumerate(s1, 1):
            cur = [i]
            for j, c2 in enumerate(s2, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (c1 != c2))
                )
            prev = cur
        return prev[-1]

    df = spark.createDataFrame(list(enumerate(strings)), "id bigint, s string")
    got = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in fuzzy_string_join(df, df, max_dist=2).collect()
        if r["a_id"] < r["b_id"]
    }
    want = {
        (i, j): lev(strings[i], strings[j])
        for i in range(len(strings))
        for j in range(i + 1, len(strings))
        if lev(strings[i], strings[j]) <= 2
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),        # user_id
            st.integers(min_value=0, max_value=200),      # minute offset
            st.sampled_from([0.25, 1.0, 7.13, 10.0]),     # value (2-dec)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_gap_fill_matches_python_model(spark, events):
    """gap_fill_hourly equals a pure-Python per-user hourly-grid simulator
    over arbitrary event sets — sparse hours, multi-event hours, users
    whose span is a single hour, carry-forward across multi-hour gaps."""
    import datetime as dt

    from apache_jira_scraper_spark.operators.events import gap_fill_hourly

    t0 = dt.datetime(2025, 3, 1)
    rows = [
        (u, t0 + dt.timedelta(minutes=m), "view", v) for u, m, v in events
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    )

    # python model
    from collections import defaultdict

    per: dict[int, dict[dt.datetime, list[float]]] = defaultdict(lambda: defaultdict(list))
    for u, ts, _, v in rows:
        per[u][ts.replace(minute=0, second=0, microsecond=0)].append(v)
    expected = {}
    for u, buckets in per.items():
        lo, hi = min(buckets), max(buckets)
        carried = None
        cur = lo
        while cur <= hi:
            vs = buckets.get(cur)
            if vs:
                carried = int(sum(round(v * 100) for v in vs))
                expected[(u, int(cur.replace(tzinfo=dt.timezone.utc).timestamp()))] = (
                    len(vs), carried, False
                )
            else:
                expected[(u, int(cur.replace(tzinfo=dt.timezone.utc).timestamp()))] = (
                    0, carried, True
                )
            cur += dt.timedelta(hours=1)

    got = {
        (r["user_id"], r["bucket_ts"]): (r["n_events"], r["sum_value_cents"], r["filled"])
        for r in gap_fill_hourly(df, max_users=10).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8).map(" ".join),
        min_size=3,
        max_size=12,
    )
)
def test_bm25_matches_python_model(spark, texts):
    """bm25_topk equals a pure-Python BM25 scorer (same integer-1e-4
    weight quantization, same tie-break) over arbitrary tiny corpora —
    repeated terms, single-term docs, identical docs."""
    import math

    from apache_jira_scraper_spark.operators.text import BM25_B, BM25_K1, bm25_topk

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_q, top_k = 2, 3
    got = {
        (r["qid"], r["rank"]): (r["did"], r["score_en4"])
        for r in bm25_topk(df, n_queries=n_q, top_k=top_k).collect()
    }

    # python model
    tf: dict[int, dict[str, int]] = {}
    for i, t in rows:
        d: dict[str, int] = {}
        for w in t.split(" "):
            d[w] = d.get(w, 0) + 1
        tf[i] = d
    N = len(rows)
    avgdl = sum(sum(d.values()) for d in tf.values()) / N
    df_t: dict[str, int] = {}
    for d in tf.values():
        for w in d:
            df_t[w] = df_t.get(w, 0) + 1

    def w_en4(doc, term):
        f = tf[doc][term]
        dl = sum(tf[doc].values())
        idf = math.log((N - df_t[term] + 0.5) / (df_t[term] + 0.5) + 1.0)
        sat = (f * (BM25_K1 + 1)) / (f + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
        # HALF-UP like Spark's F.round (python round is banker's)
        return int(math.floor(idf * sat * 10_000 + 0.5))

    expected = {}
    for qid in range(min(n_q, N)):
        scores = []
        for did in tf:
            if did == qid:
                continue
            s = sum(w_en4(did, t) for t in tf[qid] if t in tf[did])
            if s or any(t in tf[did] for t in tf[qid]):
                scores.append((did, s))
        scores.sort(key=lambda p: (-p[1], p[0]))
        for rank, (did, s) in enumerate(scores[:top_k], 1):
            expected[(qid, rank)] = (did, s)
    assert got == expected


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20_000),  # doc_ids span buckets
            st.integers(min_value=0, max_value=50),      # words per doc
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_pack_sequences_matches_python_prefix_sum(spark, docs_spec):
    """The two-phase distributed prefix sum equals the direct Python
    cumsum over doc_id order for ANY id distribution — including ids that
    straddle PACK_BUCKET boundaries and sparse buckets (the decomposition
    cases the crafted test can't enumerate). n_tokens is len(split(' '))
    per engine semantics: ''.split(' ') == [''] has length 1, so a
    0-word doc still carries one token."""
    from apache_jira_scraper_spark.operators.text import pack_sequences

    rows = [(i, "w " * k) for i, k in docs_spec]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["cum_start"], r["pack_first"], r["pack_last"])
        for r in pack_sequences(df, context_len=7).collect()
    }
    cum = 0
    for i, k in sorted(docs_spec):
        nt = len(("w " * k).split(" "))
        assert got[i] == (nt, cum, cum // 7, (cum + nt - 1) // 7), i
        cum += nt


# --- r12 property pins: BPE and stupid-backoff ------------------------------

# word corpora from a tiny alphabet so merges genuinely collide/compete
# (a wide alphabet makes every pair unique and the argmax degenerate)
_BPE_WORD = st.text(alphabet="abc", min_size=1, max_size=6)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(_BPE_WORD, min_size=1, max_size=6),
                min_size=1, max_size=5))
def test_bpe_train_matches_sennrich_reference(spark, docs_words):
    """Merge SEQUENCE equality vs the pure-Python Sennrich reference on
    random tiny-alphabet corpora — ties, overlaps, and early stops land
    wherever hypothesis puts them."""
    from collections import Counter

    from apache_jira_scraper_spark.operators.bpe import bpe_train
    from tests.test_bpe import _ref_bpe

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wf: Counter = Counter(w for ws in docs_words for w in ws)
    got_merges, got_words = bpe_train(docs, n_merges=5)
    ref_merges, ref_segs = _ref_bpe(dict(wf), 5)
    assert got_merges == ref_merges
    assert {r["w"]: list(r["symbols"]) for r in got_words.collect()} == ref_segs


def _py_backoff(docs: list[tuple[int, str]], mod: int = 7):
    """Independent pure-Python stupid-backoff model (mirrors the operator
    contract, not its code): train on doc_id % mod != 0, score all."""
    import math
    from collections import Counter

    tri_c: Counter = Counter()
    bi_c: Counter = Counter()
    uni_c: Counter = Counter()
    for did, text in docs:
        if did % mod == 0:
            continue
        ts = text.split(" ")
        uni_c.update(ts)
        for i in range(len(ts) - 1):
            bi_c[(ts[i], ts[i + 1])] += 1
        for i in range(len(ts) - 2):
            tri_c[(ts[i], ts[i + 1], ts[i + 2])] += 1
    n_tok = sum(uni_c.values())
    v = len(uni_c)
    out = {}
    for did, text in docs:
        ts = text.split(" ")
        lps = []
        for i in range(len(ts) - 2):
            w1, w2, w3 = ts[i], ts[i + 1], ts[i + 2]
            if tri_c[(w1, w2, w3)]:
                s = math.log(tri_c[(w1, w2, w3)] / bi_c[(w1, w2)])
            elif bi_c[(w2, w3)]:
                s = math.log(0.4 * bi_c[(w2, w3)] / uni_c[w2])
            else:
                s = math.log(0.16 * (uni_c[w3] + 1) / (n_tok + v))
            lps.append(round(s * 10_000))
        # (count, sum) only: the truncating average is pinned in the
        # hand-computed test (Spark DIV truncates toward zero on negative
        # operands; Python // floors — not a fair model here)
        out[did] = (len(lps), sum(lps))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c", "d"]),
                         min_size=0, max_size=8),
                min_size=1, max_size=12))
def test_trigram_backoff_matches_python_model(spark, docs_tokens):
    """Random tiny-vocab corpora: the Spark operator's (n, sum) must match
    the independent Python model for every doc; the truncating average is
    pinned separately by the hand-computed test (Spark DIV vs Python //
    differ on negative operands, so the model compares sum and count)."""
    from apache_jira_scraper_spark.operators.text import trigram_backoff_logprob

    rows = [(i, " ".join(ts) if ts else "x") for i, ts in enumerate(docs_tokens)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # the train split must be non-empty for the model to exist
    if all(i % 7 == 0 for i, _ in rows):
        rows.append((1, "a b"))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = _py_backoff(rows)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["sum_logprob_en4"])
        for r in trigram_backoff_logprob(docs).collect()
    }
    for did, (n, total) in ref.items():
        assert got[did] == (n, total), (did, got[did], (n, total))


def _py_ppl_bucket(scores: list[tuple[int, int, int]], grid: int = 100):
    """Independent model of ppl_bucket: (doc_id, n_trigrams, avg_en4)
    rows -> {doc_id: (bucket, s_grid, cut_lo, cut_hi)}. Truncating
    integer division toward zero (Spark DIV / DuckDB //), value
    histogram over scored docs, cutoffs = smallest grid value whose
    ascending cumulative count reaches ceil(n/3) / ceil(2n/3)."""
    import math

    def trunc_div(a: int, b: int) -> int:
        q = abs(a) // b
        return -q if a < 0 else q

    g = {d: trunc_div(avg, grid) for d, n, avg in scores}
    scored = sorted(g[d] for d, n, _ in scores if n > 0)
    cut_lo = cut_hi = 0
    if scored:
        n = len(scored)
        hist: dict[int, int] = {}
        for s in scored:
            hist[s] = hist.get(s, 0) + 1
        cum, c1, c2 = 0, None, None
        for s in sorted(hist):
            cum += hist[s]
            if c1 is None and cum >= math.ceil(n / 3):
                c1 = s
            if c2 is None and cum >= math.ceil(2 * n / 3):
                c2 = s
        cut_lo, cut_hi = c1, c2
    out = {}
    for d, ntr, _ in scores:
        s = g[d]
        if ntr == 0:
            b = "skip"
        elif s <= cut_lo:
            b = "tail"
        elif s <= cut_hi:
            b = "middle"
        else:
            b = "head"
        out[d] = (b, s, cut_lo, cut_hi)
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),      # n_trigrams (0 = skip)
        st.integers(min_value=-150_000, max_value=0)  # avg_logprob_en4
    ),
    min_size=1, max_size=20,
))
def test_ppl_bucket_matches_python_model(spark, rows):
    """Random score tables (including all-skip, single-doc, heavy-tie
    corpora): labels, grid scores, and BOTH cutoffs must match the
    independent Python model exactly."""
    from apache_jira_scraper_spark.operators.text import ppl_bucket

    scores = [(i, n, avg if n > 0 else 0) for i, (n, avg) in enumerate(rows)]
    df = spark.createDataFrame(
        [(d, n, 0, avg) for d, n, avg in scores],
        "doc_id long, n_trigrams long, sum_logprob_en4 long, avg_logprob_en4 long",
    )
    ref = _py_ppl_bucket(scores)
    got = {
        r["doc_id"]: (r["bucket"], r["s_grid"], r["cut_lo"], r["cut_hi"])
        for r in ppl_bucket(df).collect()
    }
    assert got == ref
