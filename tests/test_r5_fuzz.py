"""Property fuzz for the round-5 ops: Spark vs pure-Python oracle vs
DuckDB twin (the r4 triangle) on hypothesis corpora — empty docs, empty
TARGET corpora (dsir's smoothed denominators must not null out), boundary
and non-dyadic fractions, whole-corpus duplicates, k > n saturation for
k-center."""

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkextract import simsearch, textops

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_text = st.lists(_word, min_size=0, max_size=10).map(" ".join)
_corpus = st.lists(
    st.tuples(st.integers(0, 60), _text, st.sampled_from(["s1", "s2"])),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
)

_il = lambda n: n.bit_length() - 1  # noqa: E731


def _feats(text):
    w = [x for x in text.split(" ") if x]
    grams = w + [f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]
    return [hashlib.md5(g.encode()).hexdigest()[:2] for g in grams]


def _dsir_oracle(rows, rate):
    from collections import Counter

    cr, ct, per_doc = Counter(), Counter(), {}
    for d, t, src in rows:
        f = _feats(t)
        if f:
            per_doc[d] = f
        cr.update(f)
        if src == "s1":
            ct.update(f)
    k = _il(sum(cr.values()) + 256) - _il(sum(ct.values()) + 256)
    sc = {
        d: (len(f), sum(_il(ct[x] + 1) - _il(cr[x] + 1) for x in f) + len(f) * k)
        for d, f in per_doc.items()
    }
    order = sorted(sc, key=lambda d: (-sc[d][1], d))
    n_keep = math.floor(len(sc) * rate)
    return {d: (sc[d][0], sc[d][1], i < n_keep) for i, d in enumerate(order)}


def _bm25_oracle(rows, query, k):
    terms = sorted({t for t in query.split(" ") if t})
    wl = {d: [x for x in t.split(" ") if x] for d, t, _s in rows}
    n_docs, w_tot = len(wl), sum(len(w) for w in wl.values())
    sc = {}
    df = {
        t: sum(1 for w in wl.values() if t in w) for t in terms
    }
    for d, w in wl.items():
        s, n_t = 0, 0
        for t in terms:
            tf = sum(1 for x in w if x == t)
            if tf == 0:
                continue
            n_t += 1
            idf = max(0, _il((n_docs - df[t]) * 2 + 1) - _il(df[t] * 2 + 1))
            s += (idf * tf * w_tot * 22000000) // (
                tf * w_tot * 10 + w_tot * 3 + len(w) * n_docs * 9
            )
        if n_t:
            sc[d] = (n_t, s)
    order = sorted(sc, key=lambda d: (-sc[d][1], d))[:k]
    return {d: (sc[d][0], sc[d][1], i + 1) for i, d in enumerate(order)}


def _split_oracle(rows, frac, salt="split"):
    thr = format(math.floor(65536 * frac), "04x")
    out = {}
    for d, t, _s in rows:
        pref = hashlib.md5(
            f"{salt}:{hashlib.md5(t.encode()).hexdigest()}".encode()
        ).hexdigest()[:4]
        out[d] = "val" if frac >= 1.0 or pref < thr else "train"
    return out


@given(_corpus)
@settings(**_SETTINGS)
def test_round5_text_ops_triangle_fuzz(spark, rows):
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    con = duckdb.connect()
    con.register("documents", pdf)
    tgt_sql = "(SELECT * FROM documents WHERE source = 's1')"
    tgt = sdf.where("source = 's1'")

    # --- DSIR (incl. the empty-target corpus: smoothing must hold) ---
    want = _dsir_oracle(rows, 0.5)
    got = {
        r.doc_id: (r.n_feats, r.dsir_score, r.selected)
        for r in textops.dsir_select(sdf, tgt, rate=0.5).collect()
    }
    assert got == want, ("dsir spark", rows)
    duck = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            textops.dsir_select_sql(0.5, "documents", tgt_sql)
        ).fetchall()
    }
    assert duck == want, ("dsir duckdb", rows)

    # --- DSIR threshold form: same scores, map-only selection ---
    thr_want = {d: (v[0], v[1], v[1] >= -5) for d, v in want.items()}
    thr_got = {
        r.doc_id: (r.n_feats, r.dsir_score, r.selected)
        for r in textops.dsir_select_threshold(sdf, tgt, -5).collect()
    }
    assert thr_got == thr_want, ("dsir_threshold spark", rows)
    thr_duck = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            textops.dsir_select_threshold_sql(-5, "documents", tgt_sql)
        ).fetchall()
    }
    assert thr_duck == thr_want, ("dsir_threshold duckdb", rows)

    # --- BM25 ---
    want_b = _bm25_oracle(rows, "aa bb", 5)
    got_b = {
        r.doc_id: (r.n_terms, r.score, r.rank)
        for r in textops.bm25_topk(sdf, "aa bb", k=5).collect()
    }
    assert got_b == want_b, ("bm25 spark", rows)
    duck_b = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(textops.bm25_topk_sql("aa bb", 5)).fetchall()
    }
    assert duck_b == want_b, ("bm25 duckdb", rows)

    # --- leakage-safe split (boundary + non-dyadic fractions) ---
    for frac in (0.0, 0.29, 1.0):
        want_s = _split_oracle(rows, frac)
        got_s = {
            r.doc_id: r.split
            for r in textops.leakage_safe_split(sdf, val_frac=frac).collect()
        }
        assert got_s == want_s, ("split spark", frac, rows)
        duck_s = {
            r[0]: r[2]
            for r in con.execute(
                textops.leakage_safe_split_sql(frac)
            ).fetchall()
        }
        assert duck_s == want_s, ("split duckdb", frac, rows)
    con.close()


# exactly float32-representable grid → Spark's array<float> cannot round
_coord = st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0])
_vecs = st.lists(
    st.tuples(st.integers(0, 30), st.tuples(_coord, _coord, _coord)),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


def _kcenter_oracle(vecs, k):
    q = {i: [int(round(x * 1000)) for x in v] for i, v in vecs}
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
            mind[i] = min(mind[i], d)
    return sorted(sel)


@given(_vecs)
@settings(**_SETTINGS)
def test_kcenter_triangle_fuzz(spark, vecs):
    """Triangle incl. k > n: once every point is covered (all min-dists
    0) the greedy rule re-picks the min vec_id with radius 0 — the
    saturation behavior, identical in all three implementations."""
    k = 4
    sdf = spark.createDataFrame(
        [(i, list(v)) for i, v in vecs], "vec_id long, embedding array<float>"
    )
    want = _kcenter_oracle(vecs, k)
    got = sorted(
        (r.sel_round, r.vec_id, r.radius)
        for r in simsearch.kcenter_select(sdf, k=k).collect()
    )
    assert got == want, ("kcenter spark", vecs)
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            [(i, list(v)) for i, v in vecs], columns=["vec_id", "embedding"]
        ),
    )
    duck = sorted(tuple(t) for t in con.execute(
        simsearch.kcenter_select_sql(k)
    ).fetchall())
    assert duck == want, ("kcenter duckdb", vecs)
    con.close()
