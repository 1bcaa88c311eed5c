"""Golden end-to-end test: full Spark pipeline vs the row-at-a-time oracle
on seeded synthetic transcripts (FIXTURES.md §4 — per-turn text equality
under stable turn ordering, plus exact span-struct equality)."""

import math

import oracle
from sparkextract import pipeline, schema, synth
from sparkextract.fused import extract_fused


def _span_key(s):
    return (s["type"], s["x0"], s["y0"], s["x1"], s["y1"], s["content"], s["score"])


def run_equality(spark, pdf, engine=pipeline.extract, **extract_kw):
    golden = oracle.extract_corpus(pdf)
    sdf = spark.createDataFrame(pdf, schema=schema.TRANSCRIPTS)
    rows = engine(sdf, **extract_kw).collect()
    got = {(r.conv_id, r.turn_idx): r for r in rows}
    assert set(got) == set(golden), (
        f"turn set mismatch: extra={set(got) - set(golden)} "
        f"missing={set(golden) - set(got)}"
    )
    for key in sorted(golden):
        g, w = got[key], golden[key]
        assert g.main_text == w["main_text"], (
            f"{key}: main_text mismatch\n GOT: {g.main_text!r}\nWANT: {w['main_text']!r}"
        )
        gs = [s.asDict() for s in g.spans]
        assert len(gs) == len(w["spans"]), f"{key}: span count {len(gs)} != {len(w['spans'])}"
        for a, b in zip(gs, w["spans"]):
            for f in ("type", "content"):
                assert a[f] == b[f], (key, f, a, b)
            for f in ("x0", "y0", "x1", "y1", "score"):
                assert math.isclose(a[f], b[f], rel_tol=0, abs_tol=0), (key, f, a, b)


def test_e2e_small(spark):
    pdf = synth.gen_transcripts(n_convs=14, seed=7)
    run_equality(spark, pdf)


def test_e2e_other_seed_with_options(spark):
    pdf = synth.gen_transcripts(n_convs=8, seed=123, skew_conv_turns=12)
    run_equality(spark, pdf, repartition=8, formula_length_buckets=4)


def test_e2e_third_seed_wider(spark):
    pdf = synth.gen_transcripts(n_convs=25, seed=2024, payload_prob=0.8)
    run_equality(spark, pdf)


def test_e2e_fused_small(spark):
    pdf = synth.gen_transcripts(n_convs=14, seed=7)
    run_equality(spark, pdf, engine=extract_fused)


def test_e2e_fused_other_seed(spark):
    pdf = synth.gen_transcripts(n_convs=8, seed=123, skew_conv_turns=12)
    run_equality(spark, pdf, engine=extract_fused, repartition=8)


def test_turn_seq_window(spark):
    pdf = synth.gen_transcripts(n_convs=5, seed=11, payload_prob=1.0)
    sdf = spark.createDataFrame(pdf, schema=schema.TRANSCRIPTS)
    rows = pipeline.extract(sdf).collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append((r.turn_idx, r.turn_seq))
    for conv, pairs in by_conv.items():
        pairs.sort()
        assert [p[1] for p in pairs] == list(range(1, len(pairs) + 1)), conv
