"""Skew robustness: a conversation 50× the median length plus a single
oversized 50-page turn, both engines vs oracle (north_rule skew fixture)."""

import datetime as dt
import random

import pandas as pd
import pytest

import oracle
from sparkextract import pipeline, schema, synth
from sparkextract.fused import extract_fused


@pytest.fixture(scope="module")
def skew_corpus():
    pdf = synth.gen_transcripts(n_convs=4, seed=99, payload_prob=1.0,
                                skew_conv_turns=300)
    rng = random.Random(1)
    pages = []
    for p in range(50):
        pages.extend(synth.gen_page(rng, p))
    giant = pd.DataFrame(
        [{"conv_id": "conv-giant", "turn_idx": 0, "role": "assistant",
          "text": "\n".join(pages), "tool": None,
          "ts": dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)}]
    )
    return pd.concat([pdf, giant], ignore_index=True)


@pytest.mark.parametrize("engine", [extract_fused, pipeline.extract],
                         ids=["fused", "staged"])
def test_skewed_corpus_equality(spark, skew_corpus, engine):
    golden = oracle.extract_corpus(skew_corpus)
    sdf = spark.createDataFrame(skew_corpus, schema=schema.TRANSCRIPTS)
    got = {(r.conv_id, r.turn_idx): r.main_text
           for r in engine(sdf, repartition=16).collect()}
    assert got == {k: v["main_text"] for k, v in golden.items()}


def test_conv_keyed_input_is_resalted(spark, skew_corpus):
    """Round-6 skew mitigation: an input explicitly repartitioned by
    conv_id ALONE is converted to fused's salted spread (identical rows;
    the executed plan's first exchange hashes (conv_id, pmod(hash(
    turn_idx), 16)) instead of serializing hot conversations), while the
    plain un-repartitioned path stays single-exchange (the O8 window)."""
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(skew_corpus, schema=schema.TRANSCRIPTS)
    plain = extract_fused(sdf)
    keyed = extract_fused(sdf.repartition(8, F.col("conv_id")))
    want = {(r.conv_id, r.turn_idx): r.main_text for r in plain.collect()}
    got = {(r.conv_id, r.turn_idx): r.main_text for r in keyed.collect()}
    assert got == want
    kplan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "pmod(hash(turn_idx" in kplan, kplan
    # the plain path must NOT gain an extra exchange from the mitigation
    pplan = plain._jdf.queryExecution().executedPlan().toString()
    assert "pmod(hash(turn_idx" not in pplan, pplan
