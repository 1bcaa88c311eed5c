"""Streaming micro-batch reuse + physical plan regression tests
(the plan *shape* is a deliverable at 100 TB: exchange counts, column
pruning, cache reuse — SURVEY.md §4)."""

import oracle
from sparkextract import schema, synth
from sparkextract.fused import extract_fused
from sparkextract.streaming import extract_stream, read_transcript_stream


def test_streaming_matches_batch(spark, tmp_path):
    pdf = synth.gen_transcripts(n_convs=6, seed=77)
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf, schema=schema.TRANSCRIPTS).repartition(3).write.parquet(src)

    out = str(tmp_path / "out")
    q = extract_stream(
        read_transcript_stream(spark, src, max_files_per_trigger=2),
        out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(300)

    got = {
        (r.conv_id, r.turn_idx): r.main_text
        for r in spark.read.parquet(out).collect()
    }
    golden = oracle.extract_corpus(pdf)
    assert got == {k: v["main_text"] for k, v in golden.items()}


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_fused_plan_single_exchange(spark, tmp_path):
    pdf = synth.gen_transcripts(n_convs=4, seed=3)
    src = str(tmp_path / "t")
    spark.createDataFrame(pdf, schema=schema.TRANSCRIPTS).write.parquet(src)
    df = extract_fused(spark.read.parquet(src))
    plan = _plan(df)
    # production path: exactly one exchange (the O8 ordering window);
    # formatted plans name each node twice (tree + details) → count tree edges
    tree = plan.split("\n\n")[0]
    assert tree.count("- Exchange") == 1, tree
    assert tree.count("- MapInPandas") == 1, tree


def test_fused_plan_column_pruning(spark, tmp_path):
    pdf = synth.gen_transcripts(n_convs=4, seed=3)
    src = str(tmp_path / "t2")
    spark.createDataFrame(pdf, schema=schema.TRANSCRIPTS).write.parquet(src)
    df = extract_fused(spark.read.parquet(src))
    plan = _plan(df)
    scan = plan[plan.index("Scan parquet"):]
    readschema = scan[scan.index("ReadSchema"): scan.index("\n", scan.index("ReadSchema"))]
    # role/ts never reach the scan (nested-column pruning of the payload)
    assert "role" not in readschema and "ts" not in readschema, readschema
