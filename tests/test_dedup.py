"""Dedup-family coverage beyond the registry gates.

The signature-producing queries (MinHash, SimHash) were de-registered in
round 2 to fit the driver's 50-query cap — their end-to-end consumers
(dedup_minhash_lsh / dedup_simhash) stay oracle-gated, and THIS file pins
the signature parity that the dropped gates used to check, plus the
df-cutoff scale knob of the n-gram jaccard join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_jira_scraper_spark.operators.dedup import (
    MINHASH_SIG_SQL,
    SIMHASH_SIG_SQL,
    q_dedup_ngram_jaccard,
    q_minhash_signatures,
    q_simhash_signatures,
)
from tests.oracle_utils import assert_matches_oracle


def test_minhash_signatures_match_oracle(spark, sf_dir):
    assert_matches_oracle(
        q_minhash_signatures(spark, sf_dir), MINHASH_SIG_SQL, sf_dir,
        name="minhash_signatures",
    )


def test_simhash_signatures_match_oracle(spark, sf_dir):
    assert_matches_oracle(
        q_simhash_signatures(spark, sf_dir), SIMHASH_SIG_SQL, sf_dir,
        name="simhash_signatures",
    )


def test_ngram_df_cutoff_prunes_and_converges(spark, sf_dir):
    """A generous cutoff must reproduce the exact result (no shingle in the
    small corpus is that hot); a cutoff of 1 keeps only unique shingles, so
    no pair can share one and the result is empty — the two endpoints of
    the recall contract."""
    exact = {(r["d1"], r["d2"]) for r in q_dedup_ngram_jaccard(spark, sf_dir).collect()}
    loose = {
        (r["d1"], r["d2"])
        for r in q_dedup_ngram_jaccard(spark, sf_dir, max_doc_freq=10**6).collect()
    }
    assert loose == exact
    strict = q_dedup_ngram_jaccard(spark, sf_dir, max_doc_freq=1).collect()
    assert strict == []


def test_connected_components_chain_and_clique(spark):
    """A 4-node chain (worst-case diameter) and a disjoint triangle must
    both collapse to their min node id; a pair component keeps its own min."""
    from apache_jira_scraper_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "d1 long, d2 long",
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_connected_components_empty_edges(spark):
    from apache_jira_scraper_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([], "d1 long, d2 long")
    assert connected_components(edges).count() == 0


def test_connected_components_long_chain(spark):
    """A 20-node path graph is the adversarial diameter case for
    min-label propagation — the loop must iterate to full convergence,
    not stop at a fixed small round count."""
    from apache_jira_scraper_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 119)], "d1 long, d2 long"
    )
    got = {(r["doc_id"], r["cluster_id"]) for r in connected_components(edges).collect()}
    assert got == {(i, 100) for i in range(100, 120)}
