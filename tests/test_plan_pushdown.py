"""Predicate pushdown / scan pruning assertions on the training-data ops
(SURVEY §4: filters and projections must reach the parquet scan)."""

import os

import pytest

from sparkextract import textops

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.skipif(not os.path.exists(SF), reason="testdata absent")
def test_jaccard_scan_prunes_columns(spark):
    # the uncapped whole-corpus jaccard must still read ONLY doc_id+text
    # from the parquet scan (shingling never touches lang/source/n_chars)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(textops.ngram_jaccard_pairs(docs))
    scan = plan[plan.index("Scan parquet"):]
    rs = scan[scan.index("ReadSchema"): scan.index("\n", scan.index("ReadSchema"))]
    assert "text" in rs, rs
    assert "lang" not in rs and "source" not in rs and "n_chars" not in rs, rs


@pytest.mark.skipif(not os.path.exists(SF), reason="testdata absent")
def test_exact_dedup_reads_only_needed_columns(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(textops.exact_dedup(docs))
    scan = plan[plan.index("Scan parquet"):]
    rs = scan[scan.index("ReadSchema"): scan.index("\n", scan.index("ReadSchema"))]
    assert "lang" not in rs and "source" not in rs and "n_chars" not in rs, rs
