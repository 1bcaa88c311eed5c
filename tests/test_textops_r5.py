"""Round-5 textops: DSIR importance-resampling selection + the
content-keyed leakage-safe split — semantic properties the hash-parity
mirror can't express (selection direction, leakage co-assignment,
boundary rates, independent Python oracle, partitioning invariance)."""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from sparkextract import textops


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _feats(text):
    w = [x for x in text.split(" ") if x != ""]
    grams = w + [f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]
    return [hashlib.md5(g.encode()).hexdigest()[:2] for g in grams]


def _dsir_oracle(rows, target_ids, rate):
    """Independent Python re-derivation of the DSIR score + rank rule
    (rows: (doc_id, text))."""
    il = lambda n: n.bit_length() - 1  # noqa: E731 — floor log2
    cr, ct, per_doc = Counter(), Counter(), {}
    for d, t in rows:
        f = _feats(t)
        if f:
            per_doc[d] = f
        cr.update(f)
        if d in target_ids:
            ct.update(f)
    k = il(sum(cr.values()) + 256) - il(sum(ct.values()) + 256)
    sc = {
        d: (len(f), sum(il(ct[x] + 1) - il(cr[x] + 1) for x in f) + len(f) * k)
        for d, f in per_doc.items()
    }
    order = sorted(sc, key=lambda d: (-sc[d][1], d))
    n_keep = math.floor(len(sc) * rate)
    return {d: (sc[d][0], sc[d][1], i < n_keep) for i, d in enumerate(order)}


def test_dsir_matches_python_oracle(spark, docs):
    target = docs.where("source = 'src0'")
    got = {
        r.doc_id: (r.n_feats, r.dsir_score, r.selected)
        for r in textops.dsir_select(docs, target, rate=0.25).collect()
    }
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    tgt_ids = {r.doc_id for r in target.select("doc_id").collect()}
    assert got == _dsir_oracle(rows, tgt_ids, 0.25)
    assert sum(1 for v in got.values() if v[2]) == math.floor(len(got) * 0.25)


def test_dsir_prefers_target_vocabulary(spark):
    """A doc written in the target slice's vocabulary must outscore a
    doc written in disjoint vocabulary — the operator's load-bearing
    direction. Target docs use 'alpha beta', off-domain use 'zeta eta';
    the probe docs reuse one side's words each."""
    rows = [
        (0, "alpha beta alpha beta alpha beta", "tgt"),
        (1, "alpha beta beta alpha alpha beta", "tgt"),
        (2, "zeta eta zeta eta zeta eta", "raw"),
        (3, "zeta eta eta zeta eta zeta", "raw"),
        (10, "alpha beta alpha", "probe"),
        (11, "zeta eta zeta", "probe"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.doc_id: r.dsir_score
        for r in textops.dsir_select(df, df.where("source = 'tgt'")).collect()
    }
    assert got[10] > got[11]
    assert got[0] > got[2]


def test_dsir_boundary_rates_and_empty_text(spark, docs):
    target = docs.where("source = 'src0'")
    none = textops.dsir_select(docs, target, rate=0.0).collect()
    assert all(not r.selected for r in none)
    every = textops.dsir_select(docs, target, rate=1.0).collect()
    assert all(r.selected for r in every)
    with pytest.raises(ValueError):
        textops.dsir_select(docs, target, rate=1.5)
    # a no-word doc has no features -> no row (bigram_lm contract)
    df = spark.createDataFrame(
        [(0, "some words here"), (1, ""), (2, "   ")],
        "doc_id long, text string",
    )
    out = textops.dsir_select(df, df.where("doc_id = 0")).collect()
    assert {r.doc_id for r in out} == {0}


def test_dsir_partitioning_invariance(spark, docs):
    """Same selected set and scores at different parallelism — the
    deterministic-rank contract (no Gumbel noise, stable tiebreak)."""
    target = docs.where("source = 'src0'")
    a = {
        r.doc_id: (r.dsir_score, r.selected)
        for r in textops.dsir_select(docs.repartition(1), target).collect()
    }
    b = {
        r.doc_id: (r.dsir_score, r.selected)
        for r in textops.dsir_select(docs.repartition(13), target).collect()
    }
    assert a == b


def test_leakage_split_co_assigns_duplicates(spark):
    """Byte-identical texts must land on the same side regardless of
    doc_id — the property doc_id-keyed hash splits lack."""
    dup = "exactly the same text either side"
    rows = [(i, dup, f"s{i % 2}") for i in range(200)] + [
        (1000 + i, f"unique text number {i}", "s0") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = textops.leakage_safe_split(df, val_frac=0.5)
    dup_sides = {
        r.split for r in out.join(
            df.where(F.col("text") == dup).select("doc_id"), "doc_id"
        ).collect()
    }
    assert len(dup_sides) == 1, "duplicate texts straddled the split"
    # and the split is genuinely two-sided on the unique docs
    uniq_sides = {
        r.split
        for r in out.where(F.col("doc_id") >= 1000).collect()
    }
    assert uniq_sides == {"train", "val"}


def test_leakage_split_boundaries_and_mass(spark, docs):
    n = docs.count()
    all_train = textops.leakage_safe_split(docs, val_frac=0.0).collect()
    assert len(all_train) == n and all(r.split == "train" for r in all_train)
    # 1.0 saturates via the explicit clause (printf('%04x', 65536) is the
    # FIVE-char '10000' and would string-compare wrong)
    all_val = textops.leakage_safe_split(docs, val_frac=1.0).collect()
    assert len(all_val) == n and all(r.split == "val" for r in all_val)
    frac = sum(
        1 for r in textops.leakage_safe_split(docs, val_frac=0.1).collect()
        if r.split == "val"
    ) / n
    assert 0.03 < frac < 0.25, frac  # ~0.1 in expectation
    with pytest.raises(ValueError):
        textops.leakage_safe_split(docs, val_frac=-0.1)


def test_leakage_split_python_oracle(spark, docs):
    got = {
        r.doc_id: r.split
        for r in textops.leakage_safe_split(docs, val_frac=0.1).collect()
    }
    thresh = "%04x" % math.floor(65536 * 0.1)
    for r in docs.select("doc_id", "text").collect():
        key = hashlib.md5(r.text.encode()).hexdigest()
        pref = hashlib.md5(f"split:{key}".encode()).hexdigest()[:4]
        assert got[r.doc_id] == ("val" if pref < thresh else "train")


def test_round5_plan_shapes(spark, docs):
    """Scale guards: leakage_safe_split is MAP-ONLY (zero exchanges —
    two md5s fused into the scan); dsir_select's per-feat delta table
    joins broadcast (no sort-merge on the gram stream) and the only
    single-partition step is the rank window over (id, score) pairs."""
    split = (
        textops.leakage_safe_split(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in split, split

    target = docs.where("source = 'src0'")
    dsir = (
        textops.dsir_select(docs, target)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in dsir  # delta(feat) onto the gram stream
    assert "SortMergeJoin" not in dsir
    assert "CartesianProduct" not in dsir


def test_dsir_threshold_is_production_form(spark, docs):
    """Threshold variant: identical scores to the rank form, selection
    = score >= min_score, and NO global rank window in the plan (the
    100 TB map-only tail the rank form's docstring promises)."""
    target = docs.where("source = 'src0'")
    ranked = {
        r.doc_id: (r.n_feats, r.dsir_score)
        for r in textops.dsir_select(docs, target).collect()
    }
    thr = textops.dsir_select_threshold(docs, target, min_score=-20)
    got = {r.doc_id: (r.n_feats, r.dsir_score, r.selected)
           for r in thr.collect()}
    assert {d: v[:2] for d, v in got.items()} == ranked
    assert all((v[1] >= -20) == v[2] for v in got.values())
    assert any(v[2] for v in got.values())
    assert not all(v[2] for v in got.values())
    plan = thr._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
