"""Adversarial payload-grammar fuzzing of the FULL pipeline (VERDICT r03
item 7): hypothesis generates corpora straight from the @page/@det
grammar — rot180 content inside masked OCR regions, nested/overlapping/
duplicate/zero-area dets on a coarse coordinate lattice (frequent exact
IoU ties), malformed lines, payload split across text/tool — and pins
the four-way triangle per example:

    Spark staged ≡ Spark fused ≡ tests/oracle (reference-pinned)
                 ≡ DuckDB e2e twin (transcripts payload source)

Scores are drawn from a non-dyadic 2-decimal lattice (the template's own
score family): sequential-mean rec_scores then never land on an EXACT
binary .xx5 midpoint, the one value class where the engines' round-half
rules legitimately differ (memory: spark-graft-gotchas)."""

import datetime
import math
import os
import sys

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import oracle  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from sparkextract import pipeline, schema  # noqa: E402
from sparkextract.e2e_sql import extract_sql  # noqa: E402
from sparkextract.fused import extract_fused  # noqa: E402
from sparkextract.tasks import transcripts_payload_cte  # noqa: E402

# coarse lattice → frequent exact containment / nesting / duplication /
# zero-area and IoU ties (the branch combinations the driver synthetic
# grammar rarely emits)
XS = [0, 80, 100, 120, 400, 900]
YS = [0, 60, 100, 200, 300]
WS = [0, 10, 100, 300, 800]
HS = [0, 8, 40, 60, 120]
SCORES = [0.1, 0.2, 0.3, 0.55, 0.7, 0.84, 0.86, 0.88, 0.9, 0.95]

WORDS = [
    "alpha", "beta", "r1c1 & r1c2", "词语", "mix 中文 txt", "a*b",
    "x`y", "t~u", "$d$", "spaced  out", "",
]
LATEX = [
    "x ^ { 2 } + y _ { 1 }", "\\sum _ { i = 0 } x _ { i }",
    "\\frac { a } { b }", "z", "$$ wrapped $$",
]
MALFORMED = [
    "@det title|0.9",                 # truncated (<7 fields)
    "@det text|abc|0|0|10|10|bad",    # non-numeric score
    "@det text|0.9|1|zz|3|4|bad",     # non-numeric coord
    "@page 3",                        # short page header
    "@det mystery|0.9|0|0|50|50|odd", # unknown category (consumes det_idx)
    "plain chatter, not a payload line",
]

cats_layout = st.sampled_from(schema.LAYOUT_CLASSES)
cats_mfd = st.sampled_from(schema.FORMULA_CLASSES)
score = st.sampled_from(SCORES)
box = st.tuples(
    st.sampled_from(XS), st.sampled_from(YS),
    st.sampled_from(WS), st.sampled_from(HS),
).map(lambda t: (t[0], t[1], t[0] + t[2], t[1] + t[3]))


def _det(cat, s, b, content):
    x0, y0, x1, y1 = b
    return f"@det {cat}|{s}|{x0}|{y0}|{x1}|{y1}|{content}"


det_layout = st.builds(
    _det, cats_layout, score, box, st.sampled_from(WORDS)
)
det_mfd = st.builds(_det, cats_mfd, score, box, st.sampled_from(LATEX))
det_ocr = st.builds(
    _det, st.just("text"), score, box,
    st.one_of(
        st.sampled_from(WORDS),
        # rot180-marked content: the angle classifier strips the marker
        # and reverses — interacts with mask splits + the x-order merge
        st.sampled_from(WORDS).map(lambda w: "@rot180 " + w[::-1]),
    ),
)
det_line = st.one_of(det_layout, det_mfd, det_ocr, st.sampled_from(MALFORMED))

page = st.tuples(
    st.integers(0, 2),  # page_no (duplicates allowed: first-occurrence tie)
    st.lists(det_line, max_size=6),
).map(lambda t: [f"@page {t[0]} 1654 2339"] + t[1])

# a turn: leading det lines BEFORE any @page (must be ignored) + 1-2 pages
turn_payload = st.tuples(
    st.lists(det_line, max_size=1), st.lists(page, min_size=1, max_size=2)
).map(lambda t: "\n".join(t[0] + [ln for pg in t[1] for ln in pg]))

# where to split the payload between text and tool (parse scans
# text + "\n" + tool)
split_mode = st.sampled_from(["text", "tool", "both"])

corpus_strategy = st.lists(
    st.tuples(st.integers(0, 1), turn_payload, split_mode),
    min_size=1, max_size=4,
)


def _to_pdf(items):
    rows = []
    turn_ctr = {}
    for conv_no, payload, mode in items:
        conv = f"conv-{conv_no:06d}"
        ti = turn_ctr.get(conv, 0)
        turn_ctr[conv] = ti + 1
        if mode == "text":
            text, tool = payload, None
        elif mode == "tool":
            text, tool = "chatter only", payload
        else:
            lines = payload.split("\n")
            cut = len(lines) // 2
            # never split mid-page-group in a way that breaks the grammar:
            # the scan is line-oriented over text+"\n"+tool, so any line
            # split is legal by construction
            text, tool = "\n".join(lines[:cut]), "\n".join(lines[cut:])
        rows.append(
            (
                conv, ti, "assistant", text, tool,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=ti),
            )
        )
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def _duck_rows(pdf):
    con = duckdb.connect()
    con.register("transcripts", pdf)
    sql = extract_sql(payload_cte=transcripts_payload_cte())
    out = {
        (r[0], r[1]): (r[2], r[3], r[4]) for r in con.execute(sql).fetchall()
    }
    con.close()
    return out


@given(corpus_strategy)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
def test_e2e_triangle_fuzz(spark, items):
    pdf = _to_pdf(items)
    golden = oracle.extract_corpus(pdf)
    sdf = spark.createDataFrame(pdf, schema=schema.TRANSCRIPTS)

    spark_out = {}
    for name, engine in (("staged", pipeline.extract), ("fused", extract_fused)):
        rows = engine(sdf).collect()
        got = {(r.conv_id, r.turn_idx): r for r in rows}
        assert set(got) == set(golden), (name, set(got) ^ set(golden))
        for key in sorted(golden):
            g, w = got[key], golden[key]
            assert g.main_text == w["main_text"], (name, key, g.main_text, w["main_text"])
            gs = [s.asDict() for s in g.spans]
            assert len(gs) == len(w["spans"]), (name, key, gs, w["spans"])
            for a, b in zip(gs, w["spans"]):
                assert a["type"] == b["type"] and a["content"] == b["content"], (
                    name, key, a, b,
                )
                for f in ("x0", "y0", "x1", "y1", "score"):
                    assert math.isclose(a[f], b[f], rel_tol=0, abs_tol=0), (
                        name, key, f, a, b,
                    )
        spark_out[name] = {
            (r.conv_id, r.turn_idx): (r.turn_seq, r.main_text, r.spans_fp)
            for r in entrymod._canonical_extract(engine(sdf)).collect()
        }

    duck = _duck_rows(pdf)
    for name, got in spark_out.items():
        assert set(got) == set(duck), (name, set(got) ^ set(duck))
        for k in sorted(duck):
            assert got[k] == duck[k], (name, k, got[k], duck[k])
