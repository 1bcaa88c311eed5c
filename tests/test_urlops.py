"""URL canonicalization: rule-level unit tests, DuckDB twin parity, and
the map-only plan guarantee for the canonicalizer."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from sparkextract import urlops as U  # noqa: E402

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

CASES = [
    # (raw, canonical) — one rule per case
    ("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&id=42&utm_campaign=y#f",
     "http://example.com/a/b?id=42"),
    ("https://Example.com:443/x", "https://example.com/x"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),  # non-default port kept
    ("http://example.com", "http://example.com/"),                 # empty path -> /
    ("http://example.com/a?z=1&a=2", "http://example.com/a?a=2&z=1"),  # param sort
    ("http://example.com/a?utm_source=x", "http://example.com/a"),  # all-utm query dropped
    ("not a url at all", "not a url at all"),                       # passthrough
]


def test_rules_unit(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "doc_id long, url string"
    )
    got = {r.url: r.canonical_url for r in U.canonical_url(df).collect()}
    for raw, want in CASES:
        assert got[raw] == want, (raw, got[raw], want)


def test_unit_cases_match_duckdb(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "doc_id long, url string"
    )
    srows = sorted(tuple(r) for r in U.canonical_url(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE u (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)",
                    [(i, raw) for i, (raw, _) in enumerate(CASES)])
    drows = sorted(con.sql(U.canonical_url_sql("u", "url")).fetchall())
    assert srows == drows


@pytest.fixture(scope="module")
def udf(spark):
    return U.documents_as_urls(spark.read.parquet(f"{SF}/documents.parquet"))


def test_corpus_twin_parity(spark, udf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    for sdf, sql in [
        (U.canonical_url(udf), U.canonical_url_sql("documents", U.url_sql_expr())),
        (U.url_dedup(udf), U.url_dedup_sql("documents", U.url_sql_expr())),
        (U.domain_stats(udf), U.domain_stats_sql("documents", U.url_sql_expr())),
    ]:
        assert sorted(tuple(r) for r in sdf.collect()) == sorted(con.sql(sql).fetchall())


def test_canonicalization_collapses_variants(spark, udf):
    rows = U.canonical_url(udf).collect()
    raw = {r.url for r in rows}
    canon = {r.canonical_url for r in rows}
    # the synthetic corpus must make normalization load-bearing: strictly
    # fewer canonical forms than raw surface forms
    assert len(canon) < len(raw)
    # and dedup groups must actually merge differing raw forms
    dups = [r for r in U.url_dedup(udf).collect() if r.n_docs > 1]
    assert dups


def test_canonicalizer_is_map_only(spark, udf):
    plan = U.canonical_url(udf)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------------ fuzzing
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_urlish = st.text(
    alphabet=st.sampled_from(list("htps:/.w?&=#ab%12_-~@[]")), max_size=60
)


@given(st.lists(_urlish, min_size=1, max_size=8, unique=True))
@settings(max_examples=25, deadline=None)
def test_canonicalize_total_and_idempotent(spark, urls):
    """Canonicalization never raises on URL-ish garbage, and is
    IDEMPOTENT: canonicalizing a canonical URL is a no-op (the defining
    property of a canonical form)."""
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    once = U.canonical_url(df).select(
        "doc_id", F.col("canonical_url").alias("url")
    )
    twice = U.canonical_url(once)
    for r in twice.collect():
        assert r.canonical_url == r.url, (r.url, r.canonical_url)


def test_canonicalize_repeated_prefix_suffix(spark):
    """Regression (ADVICE r03): repeated www. prefixes and :80 suffixes
    must strip WHOLESALE in one pass — `h://www.www.a` used to
    canonicalize to `h://www.a/` (idempotency violation)."""
    cases = [
        (0, "http://www.www.a.com/x"),
        (1, "http://www.www.www.b.com:80:80/y/"),
        (2, "https://www.c.com:443:443"),
    ]
    df = spark.createDataFrame(cases, "doc_id long, url string")
    got = {r.doc_id: r.canonical_url for r in U.canonical_url(df).collect()}
    assert got[0] == "http://a.com/x"
    assert got[1] == "http://b.com/y"
    assert got[2] == "https://c.com/"
