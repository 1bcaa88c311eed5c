"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

The flagship metric is extraction throughput in turns/sec (BASELINE.json
"metric"); the suite also times the training-data operators. Execution is
forced with the noop sink so timings measure the full plan, not collect().

Env knobs:
  SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] cores (default 32)
  BENCH_REPLICATE      extraction corpus multiplier (default 8)
  BENCH_MASTER         override master (e.g. local[8] for scaling runs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkextract import pipeline, relops, simsearch, textops  # noqa: E402
from sparkextract.docsource import (  # noqa: E402
    documents_as_transcripts,
    replicate_documents,
)
from sparkextract.fused import extract_fused  # noqa: E402


def textops_clusters(spark, docs):
    from sparkextract.simsearch import neardup_clusters

    return neardup_clusters(docs)
from sparkextract.minslice import min_slice  # noqa: E402
from sparkextract.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "8"))
MASTER = os.environ.get("BENCH_MASTER", f"local[{CPUS}]")


def _sf() -> float:
    tag = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(tag.replace("sf", ""))
    except ValueError:
        return -1.0


def run(spark) -> dict:
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")  # noqa: E731
    docs = t("documents")
    # replicated corpus inherits the source's 1-2 parquet splits — spread it
    # (on a real cluster the input is already thousands of splits)
    big_docs = replicate_documents(docs, REPLICATE).repartition(CPUS * 2)
    transcripts = documents_as_transcripts(big_docs)
    n_turns = transcripts.count()

    def force(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    # warm-up: JVM/codegen/Arrow paths (not reported)
    force(min_slice(docs.limit(50)))

    timings["extract_pipeline"] = force(extract_fused(transcripts))
    timings["extract_staged"] = force(pipeline.extract(transcripts))
    timings["extract_min_slice"] = force(min_slice(big_docs))
    timings["dedup_exact"] = force(textops.exact_dedup(big_docs))
    timings["minhash_signature"] = force(textops.minhash_signature(big_docs))
    timings["lsh_candidate_pairs"] = force(textops.lsh_candidate_pairs(big_docs))
    timings["simhash"] = force(textops.simhash(big_docs))
    timings["token_count"] = force(textops.token_count(big_docs))
    timings["doc_fingerprint"] = force(textops.fingerprint(big_docs))
    timings["winnow_fingerprints"] = force(textops.winnow_fingerprints(big_docs))
    timings["simhash_neardup"] = force(textops.simhash_neardup(docs))
    timings["ngram_jaccard"] = force(textops.ngram_jaccard_pairs(docs))
    timings["ann_cosine_topk"] = force(simsearch.ann_topk(t("embeddings")))
    timings["ann_ivf_topk"] = force(simsearch.ivf_topk(t("embeddings")))
    timings["ann_ivf_train"] = force(simsearch.ivf_train(t("embeddings")))
    timings["ann_ivf_topk_trained"] = force(
        simsearch.ivf_topk_trained(t("embeddings"))
    )
    timings["cosine_neardup_blocked"] = force(
        simsearch.cosine_neardup_blocked(t("embeddings"))
    )
    timings["cosine_neardup_lsh"] = force(
        simsearch.cosine_neardup_lsh(docs, t("embeddings"), threshold=0.05)
    )
    timings["neardup_clusters"] = force(textops_clusters(spark, t("documents")))
    timings["o5_interval_union"] = force(relops.interval_union(t("orders")))
    timings["j1_first_wins"] = force(relops.first_wins_fill(t("lineitem")))

    # --- skew story (north_rule): one conversation holds ~80% of turns.
    # unsalted = repartition on conv_id only (the hot conv lands on ONE
    # task); salted = fused's (conv_id, pmod(hash(turn_idx),16)) spread.
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    skew_docs = replicate_documents(docs, max(1, REPLICATE // 2))
    skewed_tr = documents_as_transcripts(skew_docs).withColumn(
        "conv_id",
        F.when(F.pmod(F.hash("conv_id", "turn_idx"), F.lit(5)) != 0, F.lit("conv-hot"))
        .otherwise(F.col("conv_id")),
    ).withColumn(
        "turn_idx",
        F.row_number().over(
            Window.partitionBy("conv_id").orderBy("turn_idx", "text")
        ).cast("int"),
    )
    skewed_tr = skewed_tr.persist()
    skewed_tr.count()  # materialize once so both runs read identical input
    timings["extract_skew_unsalted"] = force(
        extract_fused(skewed_tr.repartition(CPUS * 2, F.col("conv_id")))
    )
    timings["extract_skew_salted"] = force(extract_fused(skewed_tr, repartition=CPUS * 2))
    skewed_tr.unpersist()

    total = round(sum(timings.values()), 3)
    return {
        "metric": "extraction+ops suite wall time (headline: turns/sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf(),
        "master": MASTER,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / timings["extract_pipeline"], 1),
    }


def main() -> None:
    spark = build_session(app="sparkextract-bench", master=MASTER)
    try:
        result = run(spark)
    finally:
        spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
