"""Replicates the driver's DuckDB-oracle comparison for every
registered query at the small scale factor. This is the primary
correctness gate during development (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from data_framework_spark.oracle import compare, diff_sample
from data_framework_spark.registry import QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, sf_dir, name):
    report = compare(spark, sf_dir, name)
    if not report["ok"] and report.get("mode") == "oracle":
        report["diff"] = diff_sample(spark, sf_dir, name)
    assert report["ok"], report


def test_every_query_returns_rows(spark, sf_dir):
    """Queries should be non-trivially populated at sf0.001 (a 0-row
    result can hash-match while verifying nothing)."""
    empty = []
    for name, q in QUERIES.items():
        if q.fn(spark, sf_dir).limit(1).count() == 0:
            empty.append(name)
    assert not empty, f"queries returning 0 rows at sf0.001: {empty}"
