"""Table loaders for the driver's synthetic parquet tables (TESTDATA.md).

All loads are plain ``spark.read.parquet`` — columnar scan with Catalyst
column pruning and predicate pushdown for free. At 100 TB the same call
reads a partitioned/ bucketed lakehouse layout; nothing here assumes
single-file inputs.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def sf_dir_from_env(default: str = "/root/testdata/sf0.1") -> str:
    """THE SPARK_GRAFT_SF_DIR lookup — bench.py and ad-hoc callers share
    it so the default scale factor lives in exactly one place (the test
    suite's separate SPARK_GRAFT_TEST_SF_DIR knob intentionally defaults
    smaller)."""
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def pin_utc_session(spark: SparkSession, why: str) -> None:
    """The engine's timestamp contract: gate outputs are compared against a
    DuckDB oracle that sees NAIVE wall-clock values, and Spark renders
    TIMESTAMP through the session time zone (toPandas, date_trunc, window
    all consult it) — so correctness REQUIRES a UTC session wherever an NTZ
    source column is cast to TIMESTAMP. The driver builds its own session,
    hence this runtime pin; it is deliberately loud (a warning, not a
    silent config rewrite) when it actually changes a non-UTC session.

    Why not a non-mutating per-column conversion instead? There isn't one
    that satisfies the oracle contract: convert_timezone('UTC', session_tz,
    ntz) preserves the INSTANT but shifts the wall values date_trunc/window
    render (diverging from the naive oracle), while reinterpreting the
    walls in the session zone preserves rendering but corrupts interval
    arithmetic across DST transitions (an hour vanishes or doubles), and
    keeping TIMESTAMP_NTZ end-to-end is rejected by watermarks/windows.
    Computing in a fixed zone — this pin — is the only shape where wall
    values, interval math, and the naive oracle all agree; the warning
    makes the one global side effect explicit instead of silent."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        import warnings

        warnings.warn(
            f"pinning spark.sql.session.timeZone=UTC (was {tz!r}): {why}; "
            "all query outputs assume a UTC session",
            stacklevel=3,
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def free_local_checkpoint(df: DataFrame | None) -> None:
    """Best-effort deterministic unpersist of a localCheckpoint's storage
    blocks. Dataset.unpersist only clears cacheManager entries — the
    checkpoint RDD otherwise waits for driver GC + ContextCleaner, which
    can pin superseded iterative/ingest state in executor storage
    indefinitely on an idle driver heap (review r08). Reaches through the
    analyzed LogicalRDD (verified on this Spark: getPersistentRDDs drops
    immediately); the freed DataFrame is UNUSABLE afterward (truncated
    lineage cannot recompute), so call only on state that has been
    replaced. Failures are swallowed — the fallback is exactly the GC
    path this accelerates — but NOT silently: with a live SparkContext,
    the first failure per process warns once and every failure
    increments FREE_CHECKPOINT_FAILURES (ADVICE r08: a Spark upgrade
    that changes the analyzed-plan shape would otherwise silently demote
    the entire storage-hygiene mechanism to GC-paced eviction). Benign
    non-failures stay silent: freeing a never-checkpointed frame (no
    LogicalRDD to reach), and any failure after the process-global
    context stopped (teardown-time best-effort frees)."""
    global FREE_CHECKPOINT_FAILURES
    if df is None:
        return
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception as exc:
        try:
            # A frame that never was a localCheckpoint has no LogicalRDD
            # to reach — a benign call (shutdown/best-effort paths free
            # whatever handle they hold), not a mechanism failure.
            node = df._jdf.queryExecution().analyzed().getClass().getSimpleName()
            if "RDD" not in node:
                return
        except Exception:
            # Cannot even inspect the plan. With the process-global
            # SparkContext gone/stopped this is a teardown-time
            # best-effort free — benign, and the GC fallback is moot.
            # With a LIVE context it is indistinguishable from an
            # upgrade that renamed the inspection accessors themselves,
            # so it COUNTS (review r09 follow-up: err on detectability —
            # the r08 contract is that live-session breakage never goes
            # silent).
            try:
                from pyspark import SparkContext

                sc = SparkContext._active_spark_context
                if sc is None or sc._jsc.sc().isStopped():
                    return
            except Exception:
                return
        # Locked read-modify-write: frees run concurrently from the
        # streaming legs' foreachBatch threads, and an unsynchronized
        # increment can undercount (losing the ==1 warn entirely) or
        # double-warn (ADVICE r09).
        with _FREE_FAILURES_LOCK:
            FREE_CHECKPOINT_FAILURES += 1
            first = FREE_CHECKPOINT_FAILURES == 1
        if first:
            import warnings

            warnings.warn(
                "io.free_local_checkpoint reach-through failed "
                f"({type(exc).__name__}: {exc}); falling back to GC-paced "
                "eviction for ALL checkpoint frees this process — probably "
                "a Spark upgrade changed the analyzed-plan Py4J shape",
                stacklevel=2,
            )


# Monotonic count of free_local_checkpoint reach-through failures — a
# nonzero value means deterministic storage hygiene has degraded to the
# GC path (see free_local_checkpoint docstring). Guarded by
# _FREE_FAILURES_LOCK (concurrent foreachBatch frees).
FREE_CHECKPOINT_FAILURES = 0
_FREE_FAILURES_LOCK = threading.Lock()

# Serializes the save-narrow-restore windows over the session-global
# spark.sql.shuffle.partitions conf (multimodal._build_clusters and
# extended.q_stream_stateful's streaming-leg window): if two such windows
# ever overlapped, the save/restore would race and the session could be
# left compiled at the narrowed width (ADVICE r09). Gate execution is
# single-threaded today — this is cheap insurance, not a hot lock.
SHUFFLE_CONF_LOCK = threading.RLock()


@contextmanager
def narrowed_shuffle_partitions(spark: SparkSession, n: int):
    """THE save-narrow-restore window over the session-global shuffle
    conf — one definition for every caller (review r10: two hand-rolled
    copies needed the same two exception-safety fixes applied twice).
    Serialized by SHUFFLE_CONF_LOCK; the conf get/set live INSIDE the
    try so a Py4J failure cannot leak the lock, and the restore is
    wrapped so the release runs even when the restore itself raises.
    old=None marks "nothing to restore"."""
    SHUFFLE_CONF_LOCK.acquire()
    old = None
    try:
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        yield
    finally:
        try:
            if old is not None:
                spark.conf.set("spark.sql.shuffle.partitions", old)
        finally:
            SHUFFLE_CONF_LOCK.release()


# Re-entrant: cached builders may consult another session cache
# (see session_cached docstring).
_SESSION_CACHE_LOCK = threading.RLock()

# Per-(cache, key) build locks (r13, VERDICT r12 item 4): the coarse
# global lock serialized INDEPENDENT cold builds — q_two_stage_topk's
# first sample paid ts-spine + pq + opq back-to-back (~15.5 s) even on
# concurrent driver threads. The global lock now only guards dict
# get/put and lock-map maintenance; each key's builder runs under its
# own RLock, so distinct builds overlap while concurrent first calls for
# the SAME key still build exactly once (the r09 leak contract).
_BUILD_LOCKS: dict = {}

# Monotonic count of session_cached() calls (hits AND builds). bench.py
# snapshots it around each gate's samples to mark gates whose benched plan
# may be a scan of a pre-materialized artifact (ADVICE r06: min-of-N over
# cached checkpoints reads as an engine win when it's a cache-warm win).
SESSION_CACHE_TOUCHES = 0


def session_cached(cache: dict, spark: SparkSession, extra_key: tuple, build):
    """Session-scoped memoization for materialized (localCheckpoint'd)
    DataFrames, keyed (applicationId, *extra_key) — THE cache discipline
    for the per-session silver tables (shingle index, pair table, simhash
    sketch, issues table, embedding projections). Entries from OTHER
    applicationIds are evicted on insert: they reference stopped
    SparkContexts whose checkpoint blocks are already gone, and would
    otherwise accumulate one dead DataFrame per session restart for the
    process lifetime.

    Locking (r13 — per-key build locks, VERDICT r12 item 4): the
    process-wide RLock guards only dict get/put and the lock map; each
    (cache, key)'s builder runs under its own RLock. Concurrent first
    calls for the SAME key still build exactly once (the r09 contract —
    losers wait, then read the winner's entry; no overwritten-checkpoint
    leak), while INDEPENDENT cold builds (e.g. q_two_stage_topk's
    ts-spine/pq/opq) can overlap on concurrent driver threads instead of
    serializing behind one global lock. Re-entrant both levels down
    because cached builders may themselves consult another session cache
    (the dependency graph is layered/acyclic — a cycle would deadlock,
    and would also be an infinite build recursion under any locking)."""
    global SESSION_CACHE_TOUCHES
    with _SESSION_CACHE_LOCK:
        SESSION_CACHE_TOUCHES += 1
        app = spark.sparkContext.applicationId
        key = (app, *extra_key)
        got = cache.get(key)
        if got is not None:
            return got
        for k in [k for k in cache if k[0] != app]:
            # review r13: never pop a build lock that is HELD — a stale
            # app's builder still in flight would otherwise (a) store its
            # result after this eviction pass (one leaked checkpointed
            # frame until the next pass) and (b) leave same-key waiters
            # minting a SECOND lock, re-creating the r09 double-build /
            # overwritten-checkpoint leak. Skipped keys are collected on
            # a later call once their builder releases.
            lk = _BUILD_LOCKS.get((id(cache), k))
            if lk is not None and not lk.acquire(blocking=False):
                continue
            try:
                del cache[k]
                _BUILD_LOCKS.pop((id(cache), k), None)
            finally:
                if lk is not None:
                    lk.release()
        lock_key = (id(cache), key)
        build_lock = _BUILD_LOCKS.get(lock_key)
        if build_lock is None:
            build_lock = _BUILD_LOCKS[lock_key] = threading.RLock()
    with build_lock:
        with _SESSION_CACHE_LOCK:
            got = cache.get(key)
        if got is None:
            got = build()
            with _SESSION_CACHE_LOCK:
                cache[key] = got
    return got


def normalize_events_ts(df: DataFrame, spark: SparkSession, context: str) -> DataFrame:
    """Normalize events.ts to a plain µs TimestampType whatever the file
    stores — THE ts dispatch, shared by the batch loader and the streaming
    source builder (extended._events_stream) so the two read identical
    wall-clock values:

      - legacy testdata: TIMESTAMP(NANOS) read as raw nanos via the
        nanosAsLong conf → DIV 1000 truncates exactly like Spark's own
        ns→µs handling would
      - current testdata: TIMESTAMP(MICROS) without timezone → Spark reads
        TIMESTAMP_NTZ, which watermarks/windows reject; cast to TIMESTAMP
        under a UTC session so the wall-clock values the DuckDB oracle
        sees in the naive column are preserved

    DuckDB-oracle queries never compare sub-second. Works on batch and
    streaming DataFrames alike (only the schema is consulted)."""
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif dt == "timestamp_ntz":
        pin_utc_session(spark, context)
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
        # rejects outright. Set the legacy conf here (runtime-settable) rather
        # than only in session.py's builder, so queries work on ANY session —
        # the correctness driver constructs its own SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(
            df,
            spark,
            "events.ts is TIMESTAMP_NTZ and must keep its wall-clock values "
            "through the TIMESTAMP cast",
        )
    return df


def load_table_parallel(
    spark: SparkSession, sf_dir: str, name: str, partitions: int | None = None
) -> DataFrame:
    """Load + round-robin repartition to the full core count.

    A small single-file parquet table arrives as ONE scan partition, so any
    compute-heavy projection over it (per-shingle md5, vector folds, Pandas
    UDF decode) runs on one core. Fanning out first costs a tiny shuffle of
    the small table and buys core-count parallelism for the expensive stage.
    On a real cluster the same call is cheap insurance against skewed file
    layouts; explicit numPartitions is preserved by AQE (no re-coalesce).
    """
    df = load_table(spark, sf_dir, name)
    n = partitions or spark.sparkContext.defaultParallelism
    # Only fan out when the scan is actually under-parallel (small/few files).
    # A big table already scans with >= core-count partitions, and a blanket
    # repartition there would be a full shuffle of the corpus — the opposite
    # of cheap insurance.
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works directly."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
