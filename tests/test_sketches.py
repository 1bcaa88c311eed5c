"""HLL register sketch + deterministic hash sampling: rho correctness
vs a bit-level Python reference, estimate accuracy vs exact distinct,
mergeability, and sampling determinism across parallelism."""

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkextract import sketches, textops  # noqa: E402

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def _py_rho(value: str) -> tuple[int, int]:
    """Reference (bucket, rho) computed at the BIT level from the md5."""
    h = hashlib.md5(value.encode()).hexdigest()
    bucket = int(h[:2], 16)
    bits64 = int(h[2:18], 16)
    if bits64 == 0:
        return bucket, 65
    return bucket, 64 - bits64.bit_length() + 1


def test_rho_matches_bitlevel_reference(spark):
    vals = [f"v{i}" for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    got = {
        r.bucket: r.max_rho
        for r in sketches.hll_registers(df, "k").collect()
    }
    want: dict = {}
    for v in vals:
        b, r = _py_rho(v)
        want[b] = max(want.get(b, 0), r)
    assert got == want


def test_estimate_within_hll_error(spark):
    n = 5000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "k string")
    regs = [(r.bucket, r.max_rho) for r in sketches.hll_registers(df, "k").collect()]
    est = sketches.hll_estimate(regs)
    # 256 registers -> ~6.5% standard error; allow 4 sigma
    assert abs(est - n) / n < 0.26


def test_registers_merge_by_max(spark):
    df = spark.createDataFrame([(f"m{i}",) for i in range(3000)], "k string")
    half1 = df.limit(1500)
    half2 = df.subtract(half1)
    r_all = {
        r.bucket: r.max_rho for r in sketches.hll_registers(df, "k").collect()
    }
    r1 = {r.bucket: r.max_rho for r in sketches.hll_registers(half1, "k").collect()}
    r2 = {r.bucket: r.max_rho for r in sketches.hll_registers(half2, "k").collect()}
    merged: dict = dict(r1)
    for b, r in r2.items():
        merged[b] = max(merged.get(b, 0), r)
    assert merged == r_all


def test_hash_sample_rate_and_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    s1 = sorted(r.doc_id for r in sketches.hash_sample(docs, "doc_id", 0.2).collect())
    # same sample at a different parallelism
    s2 = sorted(
        r.doc_id
        for r in sketches.hash_sample(docs.repartition(13), "doc_id", 0.2).collect()
    )
    assert s1 == s2 and s1
    # rate within binomial 4-sigma
    import math

    sigma = math.sqrt(n * 0.2 * 0.8)
    assert abs(len(s1) - 0.2 * n) < 4 * sigma + 1
    # nested property: a 10% sample is a subset of the 20% sample
    s3 = set(r.doc_id for r in sketches.hash_sample(docs, "doc_id", 0.1).collect())
    assert s3 <= set(s1)


def test_hash_sample_bad_rate(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        sketches.hash_sample(docs, "doc_id", 1.5)


def test_hll_words_plan_tiny_shuffle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = sketches.hll_registers(textops.words(docs), "word")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one partial+final agg pair on the 256-key bucket; no join anywhere
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def _py_cms_bucket(r: int, value: str) -> int:
    h = hashlib.md5(f"{r}:{value}".encode()).hexdigest()
    i = [sketches.HEX.index(c) for c in h[:3]]
    return i[0] * 64 + i[1] * 4 + i[2] // 4


def test_cms_matches_reference_and_bounds(spark):
    """Registers equal a Python reference; estimates never undercount
    and are exact for items far above the collision noise floor."""
    vals = [("hot",)] * 500 + [(f"cold{i}",) for i in range(2000)]
    df = spark.createDataFrame(vals, "k string")
    regs = [(r.row, r.bucket, r.n) for r in sketches.cms_registers(df, "k").collect()]
    want: dict = {}
    for (v,) in vals:
        for r in range(sketches.CMS_DEPTH):
            kk = (r, _py_cms_bucket(r, v))
            want[kk] = want.get(kk, 0) + 1
    assert {(r, b): n for r, b, n in regs} == want
    # point estimates: >= truth always; 'hot' ~exact (noise << 500)
    est_hot = sketches.cms_estimate(regs, "hot")
    assert 500 <= est_hot <= 500 + 2500 // 1024 * 8 + 50
    for v in ("cold7", "cold1999", "absent"):
        truth = 1 if v.startswith("cold") else 0
        assert sketches.cms_estimate(regs, v) >= truth


def test_cms_merges_by_sum(spark):
    df = spark.createDataFrame([(f"m{i % 40}",) for i in range(400)], "k string")
    half1 = df.limit(200)
    half2 = df.exceptAll(half1)  # multiset complement (dup keys!)
    r_all = {(r.row, r.bucket): r.n for r in sketches.cms_registers(df, "k").collect()}
    r1 = {(r.row, r.bucket): r.n for r in sketches.cms_registers(half1, "k").collect()}
    r2 = {(r.row, r.bucket): r.n for r in sketches.cms_registers(half2, "k").collect()}
    merged = dict(r1)
    for k, n in r2.items():
        merged[k] = merged.get(k, 0) + n
    assert merged == r_all


def test_hash_sample_rate_one_keeps_all(spark):
    # regression: format(65536,'04x') is 5 hex chars; the lexicographic
    # prefix compare would silently drop ~94% of rows at rate=1.0
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sketches.hash_sample(docs, "doc_id", 1.0).count() == docs.count()
    assert sketches.hash_sample_pred_sql("doc_id", 1.0) == "TRUE"


def test_hash_sample_rate_zero_keeps_none(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sketches.hash_sample(docs, "doc_id", 0.0).count() == 0
