"""Testdata contracts the oracle arithmetic depends on (VERDICT r07 item 6).

The multimodal_decode byte/patch oracles (and the r08 phash legs) model
Spark's `cast(text as binary)` with DuckDB's `ascii(substr(text, i, 1))` —
an identity ONLY while documents.text is pure ASCII (one byte per char,
code points < 128). If a testdata regeneration ever ships non-ASCII text,
this fails LOUDLY here instead of surfacing as a hash-mismatch mystery in
the driver gate.
"""
from __future__ import annotations

import os

import duckdb
import pytest

SF_ROOT = "/root/testdata"


def _sf_dirs():
    if not os.path.isdir(SF_ROOT):
        return []
    return sorted(
        os.path.join(SF_ROOT, d)
        for d in os.listdir(SF_ROOT)
        if os.path.exists(os.path.join(SF_ROOT, d, "documents.parquet"))
    )


@pytest.mark.parametrize("sf_dir", _sf_dirs() or [None])
def test_documents_text_is_pure_ascii(sf_dir):
    if sf_dir is None:
        pytest.skip("no testdata present")
    bad = duckdb.sql(
        f"""
        SELECT count(*) AS bad FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE strlen(text) != length(text)  -- byte length vs char length
           OR length(list_filter(
                  list_transform(generate_series(1, length(text), 1),
                                 i -> ascii(substr(text, i, 1))),
                  b -> b >= 128 OR b < 1)) > 0
        """
    ).fetchone()[0]
    assert bad == 0, (
        f"{sf_dir}/documents.parquet holds non-ASCII (or NUL) text in {bad} "
        "docs: the byte/patch/phash oracles' ascii(substr)==byte identity "
        "(and the afeat fixture's translate map, which excludes NUL — "
        "Spark strings are not NUL-transparent everywhere) is broken — "
        "regenerate or rewrite the oracles byte-wise"
    )
