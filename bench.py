"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

The flagship metric is extraction throughput in turns/sec (BASELINE.json
"metric"); the suite also times the training-data operators. Execution is
forced with the noop sink so timings measure the full plan, not collect().

Round 3: every query runs BENCH_REPEAT times (default 3) with a FRESH
DataFrame build per repetition (a reused DataFrame object lets Spark skip
whole stages via shuffle-output reuse, which would understate repeat
cost). Reported per-query number = median; "queries_spread" carries
[min, max] so round-over-round deltas can be read against the noise band
(BENCH_r02's minhash_signature 2.5× swing was exactly this noise).

Env knobs:
  SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] cores (default 32)
  BENCH_REPLICATE      extraction corpus multiplier (default 8)
  BENCH_MASTER         override master (e.g. local[8] for scaling runs)
  BENCH_REPEAT         repetitions per query (default 3, median reported)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkextract import (  # noqa: E402
    bpe,
    htmlops,
    pipeline,
    relops,
    simsearch,
    sketches,
    textops,
    urlops,
)
from sparkextract.docsource import (  # noqa: E402
    documents_as_transcripts,
    replicate_documents,
)
from sparkextract.fused import extract_fused  # noqa: E402
from sparkextract.minslice import min_slice  # noqa: E402
from sparkextract.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "8"))
MASTER = os.environ.get("BENCH_MASTER", f"local[{CPUS}]")
REPEAT = int(os.environ.get("BENCH_REPEAT", "3"))


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

    def force_once(build) -> float:
        # the timer wraps BUILD + execution: iterative operators
        # (ivf_train, neardup_clusters) run driver loops and eager
        # materialization at build time — timing only the final write
        # would report near-zero for them
        t0 = time.perf_counter()
        build().write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}

    def bench(name: str, build, clear_cache: bool = False) -> None:
        """median of REPEAT runs, fresh DataFrame per run.

        ``clear_cache``: drop the SQL cache before every repetition —
        required for builds with an INTERNAL .persist() (the staged
        pipeline): Spark's CacheManager matches persisted plans by
        canonicalized form ACROSS calls, so without this, repetitions
        2..n silently read the first run's cache and the median reports
        warm-cache time (this understated extract_staged in r1-r3)."""
        runs = []
        for _ in range(REPEAT):
            if clear_cache:
                spark.catalog.clearCache()
            runs.append(force_once(build))
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]

    # warm-up: JVM/codegen/Arrow paths (not reported)
    force_once(lambda: min_slice(docs.limit(50)))

    # key renamed from "extract_pipeline" in round 5: it has always benched
    # the FUSED engine while queries()'s "extract_pipeline" is the staged
    # one — the old name made round-over-round deltas compare different
    # engines. History: BENCH_r01-r04 "extract_pipeline" == this key.
    bench("extract_fused", lambda: extract_fused(transcripts))
    bench("extract_staged", lambda: pipeline.extract(transcripts), clear_cache=True)
    bench("extract_min_slice", lambda: min_slice(big_docs))
    bench("dedup_exact", lambda: textops.exact_dedup(big_docs))
    bench("minhash_signature", lambda: textops.minhash_signature(big_docs))
    bench("lsh_candidate_pairs", lambda: textops.lsh_candidate_pairs(big_docs))
    bench("simhash", lambda: textops.simhash(big_docs))
    bench("token_count", lambda: textops.token_count(big_docs))
    bench("doc_fingerprint", lambda: textops.fingerprint(big_docs))
    bench("winnow_fingerprints", lambda: textops.winnow_fingerprints(big_docs))
    bench("substring_dup_spans", lambda: textops.substring_dup_spans(big_docs))
    bench("simhash_neardup", lambda: textops.simhash_neardup(docs))
    bench(
        "html_main_content",
        lambda: htmlops.html_main_content(htmlops.documents_as_html(big_docs)),
    )
    bench(
        "html_dom_extract",
        lambda: htmlops.html_dom_extract(htmlops.documents_as_html(big_docs)),
    )
    bench("ngram_jaccard", lambda: textops.ngram_jaccard_pairs(docs))
    bench("quality_classifier", lambda: textops.quality_classifier(big_docs))
    bench("bigram_lm_score", lambda: textops.bigram_lm_score(big_docs))
    bench("tfidf_topk", lambda: textops.tfidf_topk(big_docs))
    bench("chunk_documents", lambda: textops.chunk_documents(big_docs))
    bench("hll_words", lambda: sketches.hll_registers(textops.words(big_docs), "word"))
    bench("cms_words", lambda: sketches.cms_registers(textops.words(big_docs), "word"))
    bench("bpe_merges", lambda: bpe.bpe_train(docs))
    bench(
        "html_extract_turns",
        lambda: htmlops.extract_html_turns(big_docs),
    )
    bench("asof_join", lambda: relops.asof_join(t("events")))
    bench("sessionize", lambda: relops.sessionize(t("events")))
    bench(
        "url_dedup",
        lambda: urlops.url_dedup(urlops.documents_as_urls(big_docs)),
    )
    bench("gopher_quality", lambda: textops.gopher_quality(big_docs))
    bench("repetition_stats", lambda: textops.repetition_stats(big_docs))
    bench("pii_scrub", lambda: textops.pii_scrub(big_docs))
    bench("baseline_ann_cosine_topk", lambda: simsearch.baseline_ann_topk(t("embeddings")))
    bench("ann_ivf_topk", lambda: simsearch.ivf_topk(t("embeddings")))
    bench("ann_ivf_train", lambda: simsearch.ivf_train(t("embeddings")))
    bench(
        "ann_ivf_topk_trained",
        lambda: simsearch.ivf_topk_trained(t("embeddings")),
    )
    bench(
        "baseline_cosine_neardup_blocked",
        lambda: simsearch.cosine_neardup_blocked(t("embeddings")),
    )
    bench(
        "cosine_neardup_lsh",
        lambda: simsearch.cosine_neardup_lsh(docs, t("embeddings"), threshold=0.05),
    )
    bench("neardup_clusters", lambda: simsearch.neardup_clusters(t("documents")))
    bench("semdedup", lambda: simsearch.semdedup(t("embeddings"), n_cells="auto"))
    bench("segment_dedup", lambda: textops.segment_dedup(big_docs))
    # replicate_documents keeps only (doc_id, text); re-derive the
    # source key for the two source-keyed ops
    from pyspark.sql import functions as _F

    big_src = big_docs.withColumn(
        "source", _F.concat(_F.lit("src"), (_F.col("doc_id") % 20).cast("string"))
    )
    bench("mixture_sample", lambda: textops.mixture_sample(big_src))
    bench("pack_sequences", lambda: textops.pack_sequences(big_src))
    bench(
        "dsir_select",
        lambda: textops.dsir_select(
            big_src, big_src.where("source = 'src0'")
        ),
    )
    bench("leakage_safe_split", lambda: textops.leakage_safe_split(big_src))
    bench(
        "dsir_select_threshold",
        lambda: textops.dsir_select_threshold(
            big_src, big_src.where("source = 'src0'"), min_score=-20
        ),
    )
    bench("bm25_topk", lambda: textops.bm25_topk(big_src))
    bench("kcenter_select", lambda: simsearch.kcenter_select(t("embeddings")))
    bench(
        "rrf_fuse_ann",
        lambda: simsearch.rrf_fuse(
            simsearch.ivf_topk(t("embeddings")),
            simsearch.ivf_topk_trained(t("embeddings")),
        ),
    )
    bench(
        "training_corpus_v4",
        lambda: simsearch.training_corpus_v4(docs, t("embeddings"), docs),
    )
    bench(
        "training_corpus_v5",
        lambda: simsearch.training_corpus_v5(
            docs, t("embeddings"), docs,
            docs.where("source = 'src0'").select("doc_id", "text"),
        ),
    )
    bench("o5_interval_union", lambda: relops.interval_union(t("orders")))
    bench("j1_first_wins", lambda: relops.first_wins_fill(t("lineitem")))

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
    bench(
        "extract_skew_unsalted",
        lambda: extract_fused(skewed_tr.repartition(CPUS * 2, F.col("conv_id"))),
    )
    bench(
        "extract_skew_salted",
        lambda: extract_fused(skewed_tr, repartition=CPUS * 2),
    )
    skewed_tr.unpersist()

    total = round(sum(timings.values()), 3)
    return {
        "metric": "extraction+ops suite wall time (headline: turns/sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_spread": spread,
        "repeat": REPEAT,
        "sf": _sf(),
        "master": MASTER,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / timings["extract_fused"], 1),
    }


def main() -> None:
    spark = build_session(app="sparkextract-bench", master=MASTER)
    try:
        result = run(spark)
    finally:
        spark.stop()
    # ONE-LINE JSON contract: the driver keeps only the LAST 2000 BYTES of
    # stdout (BENCH_r03/r04 both captured exactly-2000-byte tails starting
    # mid-line — the full ~4.5 KB line never fit). So: full detail goes to
    # BENCH/last_suite.json; stdout gets a COMPACT headline that must fit
    # entirely inside the tail. Per-query medians ride along at 1-decimal
    # precision only if the line stays under budget; spreads never do.
    here = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(here, "BENCH", "last_suite.json")
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")

    headline = {k: v for k, v in result.items() if k != "queries_spread"}
    headline["queries"] = {k: round(v, 1) for k, v in result["queries"].items()}
    headline["detail"] = "BENCH/last_suite.json"
    line = json.dumps(headline, separators=(",", ":"))
    if len(line) >= 1800:
        headline.pop("queries")
        line = json.dumps(headline, separators=(",", ":"))
    assert len(line) < 1800, len(line)
    sys.stderr.flush()
    sys.stdout.flush()
    sys.stdout.write(line + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
