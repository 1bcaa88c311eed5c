"""Round-5 retrieval/selection ops: fixed-point BM25 ranking and greedy
k-center diversity selection — semantic properties the hash-parity
mirror can't express (ranking direction, length normalization, coverage
geometry, independent Python oracles, partitioning invariance)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from sparkextract import simsearch, textops


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


# --- BM25 ---------------------------------------------------------------


def _bm25_oracle(rows, query, k):
    """Independent Python re-derivation of the fixed-point BM25 rule
    (rows: (doc_id, text))."""
    il = lambda n: n.bit_length() - 1  # noqa: E731
    terms = sorted({t for t in query.split(" ") if t})
    wl = {d: [x for x in t.split(" ") if x] for d, t in rows}
    n_docs, w_tot = len(wl), sum(len(w) for w in wl.values())
    tf = {
        (d, t): sum(1 for x in w if x == t)
        for d, w in wl.items()
        for t in terms
    }
    df = {t: sum(1 for d in wl if tf[(d, t)] > 0) for t in terms}
    sc = {}
    for d, w in wl.items():
        s, n_t = 0, 0
        for t in terms:
            if tf[(d, t)] == 0:
                continue
            n_t += 1
            idf = max(0, il((n_docs - df[t]) * 2 + 1) - il(df[t] * 2 + 1))
            s += (idf * tf[(d, t)] * w_tot * 22000000) // (
                tf[(d, t)] * w_tot * 10 + w_tot * 3 + len(w) * n_docs * 9
            )
        if n_t:
            sc[d] = (n_t, s)
    order = sorted(sc, key=lambda d: (-sc[d][1], d))[:k]
    return {d: (sc[d][0], sc[d][1], i + 1) for i, d in enumerate(order)}


def test_bm25_matches_python_oracle(spark, docs):
    got = {
        r.doc_id: (r.n_terms, r.score, r.rank)
        for r in textops.bm25_topk(docs, "dup window merge", k=10).collect()
    }
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    assert got == _bm25_oracle(rows, "dup window merge", 10)
    assert len(got) == 10


def test_bm25_ranking_direction(spark):
    """More occurrences of a rare query term rank higher; at equal tf a
    LONGER doc ranks lower (the b-length normalization); a term present
    in every doc has clamped idf 0 and cannot reorder."""
    filler = "x y z w v u t s r q p o n m l k"
    rows = [
        (0, "needle needle needle " + filler),
        (1, "needle " + filler),
        (2, "needle " + filler + " " + filler),
        # enough term-free docs that 'needle' stays rare: 1-bit idf needs
        # df < ~N/3 before the clamped ilog2 difference goes positive
    ] + [(3 + i, filler) for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.score, r.rank) for r in
           textops.bm25_topk(df, "needle", k=10).collect()}
    assert set(got) == {0, 1, 2}, "doc without the term must not appear"
    assert got[0][1] == 1, "highest tf wins"
    assert got[1][0] > got[2][0], "longer doc scores lower at equal tf"
    # 'x' is in docs 0-3 minus none => df == n_docs, idf clamps to 0
    allx = textops.bm25_topk(df, "x", k=10).collect()
    assert {r.score for r in allx} == {0}
    with pytest.raises(ValueError):
        textops.bm25_topk(df, "  ")


def test_bm25_plan_shape(spark, docs):
    """The |query|-row df table and the 1-row totals broadcast; the only
    allowed non-broadcast join is the doc-keyed tf⋈dl; no cartesian."""
    plan = (
        textops.bm25_topk(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row totals crossJoin
    assert plan.count("SortMergeJoin") <= 1, plan


# --- k-center -----------------------------------------------------------


def _kcenter_oracle(vecs, k):
    """Independent greedy max-min selection on quantized ints."""
    q = {
        i: [int(round(float(x) * 1000)) for x in v]
        for i, v in vecs.items()
    }
    seed = min(q)
    sel = [(0, seed, None)]
    mind = {
        i: sum((a - b) ** 2 for a, b in zip(v, q[seed]))
        for i, v in q.items()
    }
    for r in range(1, k):
        far = min(mind, key=lambda i: (-mind[i], i))
        sel.append((r, far, mind[far]))
        for i, v in q.items():
            d = sum((a - b) ** 2 for a, b in zip(v, q[far]))
            if d < mind[i]:
                mind[i] = d
    return sel


def test_kcenter_matches_python_oracle(spark, emb):
    got = sorted(
        (r.sel_round, r.vec_id, r.radius)
        for r in simsearch.kcenter_select(emb, k=6).collect()
    )
    vecs = {
        r.vec_id: list(r.embedding)
        for r in emb.select("vec_id", "embedding").collect()
    }
    assert got == sorted(_kcenter_oracle(vecs, 6))


def test_kcenter_covers_separated_clusters(spark):
    """Four well-separated clusters, k=4: greedy k-center must pick one
    point from EACH cluster (any miss leaves a radius ~ the inter-cluster
    distance — the 2-approx guarantee makes the cover exact here)."""
    corners = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0)]
    rows = []
    for ci, (cx, cy) in enumerate(corners):
        for j in range(5):
            rows.append((ci * 10 + j, [cx + 0.01 * j, cy - 0.01 * j]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    picked = {
        r.vec_id // 10
        for r in simsearch.kcenter_select(df, k=4).collect()
    }
    assert picked == {0, 1, 2, 3}
    # radius after covering all clusters is intra-cluster (< 1 unit²·10⁶)
    radii = [
        r.radius for r in simsearch.kcenter_select(df, k=5).collect()
        if r.sel_round == 4
    ]
    assert radii[0] < 1_000_000


def test_kcenter_invariants(spark, emb):
    out = simsearch.kcenter_select(emb, k=8).collect()
    ids = [r.vec_id for r in out]
    assert len(ids) == len(set(ids)) == 8
    by_round = sorted(out, key=lambda r: r.sel_round)
    assert by_round[0].radius is None
    radii = [r.radius for r in by_round[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:])), "radius must shrink"
    one = simsearch.kcenter_select(emb, k=1).collect()
    assert [(r.sel_round, r.radius) for r in one] == [(0, None)]
    with pytest.raises(ValueError):
        simsearch.kcenter_select(emb, k=0)


def test_kcenter_partitioning_invariance(spark, emb):
    a = sorted(
        (r.sel_round, r.vec_id, r.radius)
        for r in simsearch.kcenter_select(emb.repartition(1), k=5).collect()
    )
    b = sorted(
        (r.sel_round, r.vec_id, r.radius)
        for r in simsearch.kcenter_select(emb.repartition(13), k=5).collect()
    )
    assert a == b


# --- RRF fusion ---------------------------------------------------------


def test_rrf_fuse_semantics(spark):
    """A candidate ranked well by BOTH systems must outscore one ranked
    equally well by only one; absent candidates contribute 0; ranks are
    deterministic under ties (n_id ASC)."""
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "q_id long, n_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 10, 2), (0, 13, 1), (0, 12, 3)], "q_id long, n_id long, rank int"
    )
    got = {r.n_id: (r.rrf_score, r.rank)
           for r in simsearch.rrf_fuse(a, b).collect()}
    # 10: 1e6//61 + 1e6//62 = 16393 + 16129; 13 only 1e6//61; 11 only 1e6//62
    assert got[10][0] == 16393 + 16129
    assert got[13][0] == 16393 and got[11][0] == 16129
    assert got[10][1] == 1, "double-ranked candidate must fuse to the top"
    assert got[12][0] == 2 * (10**6 // 63)
    # 10 (32522) > 12 (31746, two mid ranks) > 13 (16393) > 11 (16129)
    assert [n for n, v in sorted(got.items(), key=lambda kv: kv[1][1])] == [
        10, 12, 13, 11
    ]


def test_rrf_matches_python_oracle_on_ivf(spark, emb):
    got = sorted(
        tuple(r)
        for r in simsearch.rrf_fuse(
            simsearch.ivf_topk(emb), simsearch.ivf_topk_trained(emb)
        ).collect()
    )
    ra = {(r.q_id, r.n_id): r.rank for r in simsearch.ivf_topk(emb).collect()}
    rb = {
        (r.q_id, r.n_id): r.rank
        for r in simsearch.ivf_topk_trained(emb).collect()
    }
    score = {}
    for key in set(ra) | set(rb):
        score[key] = (10**6 // (60 + ra[key]) if key in ra else 0) + (
            10**6 // (60 + rb[key]) if key in rb else 0
        )
    want = []
    by_q = {}
    for (q, n), sc in score.items():
        by_q.setdefault(q, []).append((n, sc))
    for q, cands in by_q.items():
        for i, (n, sc) in enumerate(
            sorted(cands, key=lambda t: (-t[1], t[0]))
        ):
            if i < 5:
                want.append((q, n, sc, i + 1))
    assert got == sorted(want)
