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
    # a collapse at nprobe=2 on the 8-cell grid means the probe ranking
    # or the candidate join broke (the production default is higher)
    assert recall[2] >= 0.5, recall


def test_auto_default_recall_at_least_075(spark):
    """Round-5 VERDICT item 3: the EXPOSED production default (auto
    cells AND the coupled auto nprobe = max(4, cells//4)) must recover
    >= 0.75 of true above-threshold pairs. Measured across the
    (cells, nprobe) grid in BENCH/recall_grid.json: the coupled rule
    holds 0.9668 @ (16, 4) sf0.01 and 0.9978 @ (32, 8) sf0.1, vs the
    old fixed nprobe=2's 0.64/0.44 decay."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    auto = simsearch.auto_cells(emb.count())
    p = simsearch.auto_nprobe(auto)
    r = simsearch.neardup_pair_recall(emb, n_cells=auto, nprobe_grid=(p,))
    assert r[p] >= 0.75, (auto, p, r)


def test_auto_nprobe_rule_matches_sql_twin():
    """auto_nprobe must stay EXACTLY the params CTE's GREATEST(4,
    cells // 4) for every power-of-two cell count the auto rule can
    emit."""
    cells = 8
    while cells <= (1 << 30):
        assert simsearch.auto_nprobe(cells) == max(4, cells // 4)
        cells *= 2


def test_components_driver_equals_distributed(spark):
    """Round-6 size-adaptive components: the driver union-find fast path
    (edges under the threshold) must label every node identically to the
    distributed min-label loop, including singletons, chains that force
    multi-round propagation, and nodes absent from every edge."""
    from pyspark.sql import functions as F

    edges = [
        (5, 3), (3, 9), (9, 7),          # chain -> min 3
        (20, 21), (21, 20),              # parallel/dup edges -> min 20
        (11, 2), (2, 15), (15, 11),      # cycle -> min 2
        (30, 31),
    ]
    nodes = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
    fast = {
        (r.doc_id, r.cluster)
        for r in simsearch._propagate_min_labels(nodes, pairs).collect()
    }
    slow = {
        (r.doc_id, r.cluster)
        for r in simsearch._propagate_min_labels(
            nodes, pairs, driver_edge_threshold=0
        ).collect()
    }
    assert fast == slow
    assert (5, 3) in fast and (7, 3) in fast and (15, 2) in fast
    assert (0, 0) in fast and (39, 39) in fast  # untouched nodes self-label
