"""Unit semantics for chunk_documents (training-window packing) and
vocab_stats (tf/df vocabulary table). Driver-gate parity is covered by
test_queries_duckdb.py; these pin the windowing math itself."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from sparkextract import textops  # noqa: E402


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_and_overlap(spark):
    # 10 words, chunk 4, overlap 1 -> stride 3 -> starts 0,3,6,9
    words = " ".join(f"w{i}" for i in range(10))
    rows = textops.chunk_documents(_df(spark, [(1, words)]), chunk_words=4, overlap=1)
    got = {r.chunk_idx: (r.chunk_text, r.n_words) for r in rows.collect()}
    assert got == {
        0: ("w0 w1 w2 w3", 4),
        1: ("w3 w4 w5 w6", 4),
        2: ("w6 w7 w8 w9", 4),
        3: ("w9", 1),  # tail clamped, never dropped
    }
    # consecutive chunks share exactly `overlap` words
    assert got[0][0].split()[-1] == got[1][0].split()[0]


def test_chunk_short_doc_single_window(spark):
    rows = textops.chunk_documents(_df(spark, [(1, "a b")]), chunk_words=64, overlap=8)
    got = rows.collect()
    assert len(got) == 1 and got[0].chunk_text == "a b" and got[0].n_words == 2


def test_chunk_invalid_overlap_raises(spark):
    with pytest.raises(ValueError):
        textops.chunk_documents(_df(spark, [(1, "a")]), chunk_words=4, overlap=4)


def test_chunk_reconstructs_document(spark):
    """Non-overlapped chunking partitions the word stream exactly."""
    words = " ".join(f"w{i}" for i in range(100))
    rows = textops.chunk_documents(_df(spark, [(1, words)]), chunk_words=7, overlap=0)
    ordered = [r.chunk_text for r in sorted(rows.collect(), key=lambda r: r.chunk_idx)]
    assert " ".join(ordered) == words


def test_chunk_plan_is_narrow(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        textops.chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_quality_classifier_exact_score(spark):
    """Score equals the hand-computed integer dot product of gram
    bucket counts with the deterministic weight vector."""
    import hashlib

    w = textops._classifier_weights()
    text = "alpha beta alpha"
    grams = ["alpha", "beta", "alpha", "alpha beta", "beta alpha"]
    want = sum(w[int(hashlib.md5(g.encode()).hexdigest()[:2], 16)] for g in grams)
    rows = textops.quality_classifier(_df(spark, [(1, text)])).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_feats == 5 and r.score == want and r["pass"] == (want >= 0)


def test_quality_classifier_plan(spark):
    """One combinable exchange (the doc_id groupBy); the weight table
    joins as a broadcast, never a shuffle."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        textops.quality_classifier(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # hashpartitioning exchanges: exactly the aggregation's
    assert plan.count("Exchange hashpartitioning") <= 2  # partial+final pair


def test_vocab_stats_tf_df(spark):
    df = _df(spark, [(1, "a b a"), (2, "b c"), (3, "b")])
    got = {r.word: (r.tf, r.df) for r in textops.vocab_stats(df).collect()}
    assert got == {"a": (2, 1), "b": (3, 3), "c": (1, 1)}


def test_training_corpus_v3_stages_bite(spark):
    """Capstone composition: every stage must filter/expand non-vacuously
    on the synthetic corpus (a gate that never fires proves nothing)."""
    from pyspark.sql import functions as F

    from sparkextract import simsearch

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = docs.count()
    g = docs.where(textops._gopher_pass_col()).count()
    qc = textops.quality_classifier(docs).where(F.col("pass")).count()
    out = simsearch.training_corpus_v3(docs, emb)
    stats = out.agg(
        F.count(F.lit(1)).alias("chunks"),
        F.countDistinct("doc_id").alias("docs_kept"),
        F.max("chunk_idx").alias("max_idx"),
    ).collect()[0]
    assert 0 < g < n            # gopher gate bites
    assert 0 < qc < g           # classifier gate bites beyond gopher
    assert 0 < stats.docs_kept < qc   # dedup stages bite
    assert stats.max_idx >= 1   # chunking actually splits some doc
    assert stats.chunks > stats.docs_kept


def test_length_quantiles_exact(spark):
    rows = [(i, "x", "en", "srcA", 10 * (i + 1)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.q: r.value for r in textops.length_quantiles(df).collect()}
    # nearest-rank (ceil) over 10 sorted values 10..100
    assert got == {50: 50, 90: 90, 99: 100}


def test_training_corpus_v4_stages_bite(spark):
    """Round-4 capstone: the three added stages (segment dedup, mixture
    sampling, packing) must each act non-vacuously on top of v3's chain."""
    from pyspark.sql import functions as F

    from sparkextract import simsearch

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = simsearch.training_corpus_v4(docs, emb, docs).cache()
    rows = out.collect()
    assert len(rows) > 0
    # mixture sampling bites: fewer docs than survive the dedup chain
    # (re-derive the pre-sampling population from the same chain prefix)
    qc = textops.quality_classifier(docs).where(F.col("pass")).select("doc_id")
    gated = docs.where(textops._gopher_pass_col()).join(qc, "doc_id")
    scrubbed = textops.pii_scrub(gated).select("doc_id", "scrubbed")
    reps = simsearch.semdedup(emb)
    sem = scrubbed.join(reps.select("doc_id"), "doc_id")
    keep = sem.groupBy(F.md5("scrubbed").alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    pre_sampling = keep.count()
    assert 0 < len(rows) < pre_sampling  # sampling bites
    # segment dedup bites somewhere: at least one doc lost a segment
    assert any(r.n_kept >= 1 for r in rows)
    segd = textops.segment_dedup(
        keep.join(sem, "doc_id").select(
            "doc_id", F.col("scrubbed").alias("text")
        )
    )
    assert segd.where(F.col("n_kept") < F.col("n_total")).count() > 0
    # packing bites: some sequence bin holds >1 doc
    bins = {}
    for r in rows:
        bins[(r.source, r.seq_bin)] = bins.get((r.source, r.seq_bin), 0) + 1
    assert max(bins.values()) > 1
    assert all(r.seq_bin >= 0 and r.n_words >= 0 for r in rows)
    out.unpersist()


def test_training_corpus_v5_manifest(spark):
    """Round-5 capstone: v5 = v4 rows + (n_feats, dsir_score, selected,
    split), each new column consistent with the STANDALONE operator run
    on the v4 survivor text — composition adds no drift — and the split/
    selection stages must both be non-vacuous on the synthetic corpus."""
    from pyspark.sql import functions as F

    from sparkextract import simsearch

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    target = docs.where("source = 'src0'").select("doc_id", "text")
    v5 = simsearch.training_corpus_v5(docs, emb, docs, target).collect()
    v4 = simsearch.training_corpus_v4(docs, emb, docs).collect()
    # v4 projection is preserved row-for-row
    assert sorted(
        (r.doc_id, r.source, r.seq_bin, r.n_words, r.text_fp, r.n_kept)
        for r in v5
    ) == sorted(tuple(r) for r in v4)
    # standalone-operator consistency on the surviving text
    full = simsearch._training_corpus_v4_full(docs, emb, docs)
    corpus = full.select("doc_id", F.col("dedup_text").alias("text"))
    want_score = {
        r.doc_id: (r.n_feats, r.dsir_score, r.selected)
        for r in textops.dsir_select_threshold(corpus, target, 40).collect()
    }
    want_split = {
        r.doc_id: r.split
        for r in textops.leakage_safe_split(
            full.select("doc_id", "source", F.col("dedup_text").alias("text"))
        ).collect()
    }
    for r in v5:
        assert (r.n_feats, r.dsir_score, r.selected) == want_score[r.doc_id]
        assert r.split == want_split[r.doc_id]
    # both stages bite
    assert {r.selected for r in v5} == {True, False} or len(v5) < 4
    assert {r.split for r in v5} <= {"train", "val"}
    assert any(r.split == "train" for r in v5)


def test_training_corpus_v5_materializes_v4_once(spark):
    """Round-6 plan guard (r5 VERDICT item 2): the v5 capstone references
    the v4 chain three times (DSIR corpus, split input, manifest join) —
    the chain must be MATERIALIZED once (localCheckpoint), so the plan
    above it reads an ExistingRDD scan and contains none of the v4
    machinery (no IVF posexplode, no python stages, no md5 dedup agg)."""
    from sparkextract import simsearch

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    target = docs.where("source = 'src0'").select("doc_id", "text")
    v5 = simsearch.training_corpus_v5(docs, emb, docs, target)
    plan = v5._jdf.queryExecution().optimizedPlan().toString()
    # every v4-chain consumer reads the checkpointed RDD...
    assert plan.count("LogicalRDD") >= 3, plan
    # ...and the chain itself (IVF training's posexplode is its
    # fingerprint) appears nowhere above the checkpoint
    assert "posexplode" not in plan, plan
