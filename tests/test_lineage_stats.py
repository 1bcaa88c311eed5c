"""Round-5 Iceberg stand-in slice: per-file min/max manifest stats +
stats-driven scan pruning, paired with sorted writes — the Iceberg
lower_bounds/upper_bounds planning path. Verifies: pruned reads equal
filtered full reads row-for-row while opening strictly fewer files,
stats match ground truth per file, compaction invalidates cleanly, and
the no-stats fallback scans footers live."""

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sparkextract import schema, synth
from sparkextract.lineage import (
    compact_snapshot,
    read_snapshot,
    read_snapshot_pruned,
    run_with_lineage,
    write_file_stats,
)


def _setup(spark, tmp_path, n_convs=24, sort_by="conv_id"):
    pdf = synth.gen_transcripts(n_convs=n_convs, seed=71)
    sdf = spark.createDataFrame(pdf, schema=schema.TRANSCRIPTS)
    out = str(tmp_path / "out")
    run_with_lineage(
        spark, sdf, out, snapshot="snapS", buckets=2, sort_by=sort_by,
        sort_partitions=8,
    )
    return out


def _rows(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.main_text)
        for r in df.select("conv_id", "turn_idx", "main_text").collect()
    )


def test_pruned_read_equals_filtered_full_read(spark, tmp_path):
    out = _setup(spark, tmp_path)
    write_file_stats(spark, out, columns=("conv_id",))
    full = read_snapshot(spark, out)
    lo, hi = "conv-000000", "conv-000005"
    pruned = read_snapshot_pruned(spark, out, "conv_id", lo, hi)
    assert _rows(pruned) == _rows(full.where(F.col("conv_id").between(lo, hi)))
    n_full, n_pruned = len(full.inputFiles()), len(pruned.inputFiles())
    # sorted writes gave files disjoint conv ranges: the narrow range
    # must open strictly fewer files (file skipping actually happened)
    assert 0 < n_pruned < n_full, (n_pruned, n_full)


def test_stats_match_ground_truth_per_file(spark, tmp_path):
    out = _setup(spark, tmp_path)
    write_file_stats(spark, out, columns=("conv_id", "turn_idx"))
    stats = spark.read.parquet(
        os.path.join(out, "_stats", "snapshot=snapS")
    ).collect()
    assert stats, "stats table must not be empty"
    by_file = {}
    for r in stats:
        by_file.setdefault(r.file, {})[r.column] = r
    for f, cols in by_file.items():
        tbl = pq.read_table(f, columns=["conv_id", "turn_idx"]).to_pydict()
        assert cols["conv_id"].vmin == min(tbl["conv_id"])
        assert cols["conv_id"].vmax == max(tbl["conv_id"])
        assert int(cols["turn_idx"].vmin) == min(tbl["turn_idx"])
        assert int(cols["turn_idx"].vmax) == max(tbl["turn_idx"])
        assert cols["conv_id"].n_rows == len(tbl["conv_id"])


def test_prune_without_precomputed_stats_falls_back_to_footers(
    spark, tmp_path
):
    out = _setup(spark, tmp_path)
    full = read_snapshot(spark, out)
    lo, hi = "conv-000000", "conv-000003"
    pruned = read_snapshot_pruned(spark, out, "conv_id", lo, hi)
    assert _rows(pruned) == _rows(full.where(F.col("conv_id").between(lo, hi)))
    assert len(pruned.inputFiles()) < len(full.inputFiles())


def test_prune_int_column_and_empty_range(spark, tmp_path):
    out = _setup(spark, tmp_path)
    write_file_stats(spark, out, columns=("turn_idx",))
    full = read_snapshot(spark, out)
    got = read_snapshot_pruned(spark, out, "turn_idx", 1, 2)
    assert _rows(got) == _rows(full.where(F.col("turn_idx").between(1, 2)))
    # a range outside every file's bounds prunes EVERYTHING but keeps
    # the schema contract
    none = read_snapshot_pruned(spark, out, "turn_idx", 10**6, 10**7)
    assert none.count() == 0
    assert none.columns == full.columns


def test_compaction_invalidates_stats_and_prune_survives(spark, tmp_path):
    out = _setup(spark, tmp_path)
    write_file_stats(spark, out, columns=("conv_id",))
    full_before = _rows(read_snapshot(spark, out))
    compact_snapshot(spark, out)
    # stats were keyed to the pre-compaction physical generation: the
    # pruned read must fall back to live footers over the NEW files and
    # still agree with the (unchanged) logical table
    lo, hi = "conv-000000", "conv-000005"
    pruned = read_snapshot_pruned(spark, out, "conv_id", lo, hi)
    expect = [r for r in full_before if lo <= r[0] <= hi]
    assert _rows(pruned) == expect
    # and stats can be re-recorded for the compacted generation
    s = write_file_stats(spark, out, columns=("conv_id",))
    assert s["physical"].endswith(".c1")
    pruned2 = read_snapshot_pruned(spark, out, "conv_id", lo, hi)
    assert _rows(pruned2) == expect
