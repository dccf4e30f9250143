"""Text-family coverage for the library operators that no longer hold their
own driver slot. q_doc_clean's gate (doc_clean_text) was folded into
doc_stats in round 3 to free a registry slot for corpus_assembly — the
standalone operator keeps oracle parity HERE so the F1 truncation contract
(+3 ellipsis, whitespace normalization) can't silently rot.
"""

from __future__ import annotations

from apache_jira_scraper_spark.operators.text import DOC_CLEAN_SQL, q_doc_clean
from tests.oracle_utils import assert_matches_oracle


def test_doc_clean_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        q_doc_clean(spark, sf_dir), DOC_CLEAN_SQL, sf_dir, name="doc_clean"
    )
