"""Property fuzz for the round-4 corpus ops: Spark vs a pure-Python
oracle vs the DuckDB twin on hypothesis-generated corpora (the
three-way triangle pins engine semantics AND twin fidelity on inputs
the synthetic tables rarely produce: empty docs, whole-corpus
duplicates, single-word sources)."""

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkextract import textops

SEG = 4
SEQ = 8
RATE = 0.5
SALT = "mix"

_word = st.sampled_from(["aa", "bb", "cc"])
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(
    st.tuples(st.integers(0, 60), _text, st.sampled_from(["s1", "s2"])),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


def _words(text):
    return [w for w in text.split(" ") if w]


def _seg_oracle(rows):
    """First-occurrence-wins in global (doc_id, chunk_idx) order."""
    seen = set()
    out = {}
    for doc_id, text, _src in sorted(rows):
        ws = _words(text)
        segs = [" ".join(ws[i : i + SEG]) for i in range(0, len(ws), SEG)]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        if kept:
            n_total = (len(ws) + SEG - 1) // SEG
            out[doc_id] = (" ".join(kept), len(kept), n_total)
    return out


def _mix_oracle(rows):
    counts = {}
    for _d, _t, src in rows:
        counts[src] = counts.get(src, 0) + 1
    n_total = sum(counts.values())
    wt = {s: math.floor(math.sqrt(c) * 100) for s, c in counts.items()}
    wsum = sum(wt.values())
    n_keep = math.floor(n_total * RATE)
    kept = set()
    for doc_id, _t, src in rows:
        c = counts[src]
        q = (n_keep * wt[src]) // wsum
        if q >= c:
            kept.add(doc_id)
        else:
            pref = hashlib.md5(f"{SALT}:{doc_id}".encode()).hexdigest()[:4]
            if pref < format((65536 * q) // c, "04x"):
                kept.add(doc_id)
    return kept


def _pack_oracle(rows):
    by_src = {}
    for doc_id, text, src in sorted(rows):
        by_src.setdefault(src, []).append((doc_id, len(_words(text))))
    out = {}
    for src, docs in by_src.items():
        cum = 0
        for doc_id, n in docs:
            out[doc_id] = (src, n, cum // SEQ)
            cum += n
    return out


@given(_corpus)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_round4_ops_triangle_fuzz(spark, rows):
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    con = duckdb.connect()
    con.register("documents", pdf)

    # --- segment dedup ---
    want = _seg_oracle(rows)
    got = {
        r.doc_id: (r.dedup_text, r.n_kept, r.n_total)
        for r in textops.segment_dedup(sdf, seg_words=SEG).collect()
    }
    assert got == want, ("segment_dedup spark", rows)
    duck = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(textops.segment_dedup_sql(SEG)).fetchall()
    }
    assert duck == want, ("segment_dedup duckdb", rows)

    # --- mixture sampling ---
    want_m = _mix_oracle(rows)
    got_m = {
        r.doc_id
        for r in textops.mixture_sample(sdf, rate=RATE, salt=SALT).collect()
    }
    assert got_m == want_m, ("mixture_sample spark", rows)
    duck_m = {
        r[0]
        for r in con.execute(textops.mixture_sample_sql(RATE, SALT)).fetchall()
    }
    assert duck_m == want_m, ("mixture_sample duckdb", rows)

    # --- packing assignment ---
    want_p = _pack_oracle(rows)
    got_p = {
        r.doc_id: (r.source, r.n_words, r.seq_bin)
        for r in textops.pack_assign(sdf, seq_len=SEQ).collect()
    }
    assert got_p == want_p, ("pack_assign spark", rows)
    duck_p = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(textops.pack_assign_sql(SEQ)).fetchall()
    }
    assert duck_p == want_p, ("pack_assign duckdb", rows)
    con.close()
