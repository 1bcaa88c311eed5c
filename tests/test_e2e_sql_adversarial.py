"""The full-pipeline DuckDB twin (e2e_sql.extract_sql) vs BOTH Spark
engines on an ADVERSARIAL documents corpus — branches the driver's
synthetic corpus never reaches: CJK text (the zh concat rule drops
trailing spaces), dollar signs inside text content (md_escape + the
strip('$') templates), punctuation density, empty text, multi-space
runs."""

import duckdb
import pandas as pd
import pytest

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod
from sparkextract.docsource import documents_as_transcripts
from sparkextract.e2e_sql import extract_sql
from sparkextract.fused import extract_fused
from sparkextract.pipeline import extract

DOCS = [
    (0, "中文 内容 测试 文字 混合 " * 30),
    (1, "mixed 中文 and english words here " * 15),
    (2, "a, b; c: d! e? punct " * 25),
    (3, "$x$ and $$y$$ dollar text words " * 16),
    (4, ""),
    (5, "word " * 200),
    (6, "one-word"),
    (7, "tail 中文" + " filler words" * 40),
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("adv") / "documents.parquet")
    pd.DataFrame(DOCS, columns=["doc_id", "text"]).to_parquet(src, index=False)
    return src


def _duck_rows(src):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src}')")
    out = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(extract_sql()).fetchall()
    }
    con.close()
    return out


@pytest.mark.parametrize("engine", [extract, extract_fused])
def test_e2e_twin_adversarial(spark, corpus, engine):
    sdf = spark.read.parquet(corpus)
    got = {
        (r.conv_id, r.turn_idx): (r.turn_seq, r.main_text, r.spans_fp)
        for r in entrymod._canonical_extract(
            engine(documents_as_transcripts(sdf))
        ).collect()
    }
    want = _duck_rows(corpus)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, got[k][1][:200], want[k][1][:200])
