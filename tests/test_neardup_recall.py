"""Blocking recall of the IVF near-dup path (the semdedup candidate
stage): precision is 1.0 by construction (exact verify), so the quality
question is what fraction of true above-threshold pairs the cell
blocking surfaces. Committed sf0.01/sf0.1 numbers: BENCH/BASELINE.md
§near-dup recall."""

import os

import pytest

from sparkextract import simsearch

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return simsearch.neardup_pair_recall(emb, nprobe_grid=(1, 2, 4))


def test_recall_bounds_and_monotone(recall):
    vals = [recall[p] for p in (1, 2, 4)]
    assert all(0.0 <= v <= 1.0 for v in vals)
    # more probes can only add candidates (verify is the same filter)
    assert vals[0] <= vals[1] <= vals[2]


def test_default_nprobe_not_degenerate(recall):
    # the semdedup default (nprobe=2) must recover a majority of true
    # pairs on this corpus; a collapse here means the probe ranking or
    # the candidate join broke
    assert recall[2] >= 0.5, recall
