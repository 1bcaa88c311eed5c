"""Round-6 optimization harness — NOT the driver contract (bench.py is
frozen for measurement; this file exists so individual queries can be
isolated, repeated, and plan-captured without touching it).

Usage:
  QUERIES=semdedup,training_corpus_v5 python bench_extra.py
  QUERIES=all REPEAT=1 python bench_extra.py
  QUERIES=semdedup PLAN_TAG=before python bench_extra.py   # also writes
      plans/r06/<query>_<tag>.txt (explain formatted) per query

Same corpus construction, session, noop-sink forcing and fresh-build
repetition rules as bench.py; per-query numbers printed as one JSON
object per line plus a summary line. Jobs are labelled with
setJobDescription so event logs / UI attribute stages to queries.
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
REPEAT = int(os.environ.get("REPEAT", os.environ.get("BENCH_REPEAT", "3")))
PLAN_TAG = os.environ.get("PLAN_TAG", "")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def builders(spark):
    """name -> zero-arg builder, mirroring bench.py's corpus setup."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")  # noqa: E731
    docs = t("documents")
    big_docs = replicate_documents(docs, REPLICATE).repartition(CPUS * 2)
    transcripts = documents_as_transcripts(big_docs)
    big_src = big_docs.withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"))
    )

    _skew_cache = []

    def skewed():
        # mirror bench.py: persist + count once so both skew runs read
        # identical materialized input
        if _skew_cache:
            return _skew_cache[0]
        skew_docs = replicate_documents(docs, max(1, REPLICATE // 2))
        df = documents_as_transcripts(skew_docs).withColumn(
            "conv_id",
            F.when(
                F.pmod(F.hash("conv_id", "turn_idx"), F.lit(5)) != 0,
                F.lit("conv-hot"),
            ).otherwise(F.col("conv_id")),
        ).withColumn(
            "turn_idx",
            F.row_number().over(
                Window.partitionBy("conv_id").orderBy("turn_idx", "text")
            ).cast("int"),
        ).persist()
        df.count()
        _skew_cache.append(df)
        return df

    return {
        "extract_fused": lambda: extract_fused(transcripts),
        "extract_staged": lambda: pipeline.extract(transcripts),
        "extract_min_slice": lambda: min_slice(big_docs),
        "dedup_exact": lambda: textops.exact_dedup(big_docs),
        "minhash_signature": lambda: textops.minhash_signature(big_docs),
        "lsh_candidate_pairs": lambda: textops.lsh_candidate_pairs(big_docs),
        "simhash": lambda: textops.simhash(big_docs),
        "token_count": lambda: textops.token_count(big_docs),
        "doc_fingerprint": lambda: textops.fingerprint(big_docs),
        "winnow_fingerprints": lambda: textops.winnow_fingerprints(big_docs),
        "substring_dup_spans": lambda: textops.substring_dup_spans(big_docs),
        "simhash_neardup": lambda: textops.simhash_neardup(docs),
        "html_main_content": lambda: htmlops.html_main_content(
            htmlops.documents_as_html(big_docs)
        ),
        "html_dom_extract": lambda: htmlops.html_dom_extract(
            htmlops.documents_as_html(big_docs)
        ),
        "ngram_jaccard": lambda: textops.ngram_jaccard_pairs(docs),
        "quality_classifier": lambda: textops.quality_classifier(big_docs),
        "bigram_lm_score": lambda: textops.bigram_lm_score(big_docs),
        "tfidf_topk": lambda: textops.tfidf_topk(big_docs),
        "chunk_documents": lambda: textops.chunk_documents(big_docs),
        "hll_words": lambda: sketches.hll_registers(textops.words(big_docs), "word"),
        "cms_words": lambda: sketches.cms_registers(textops.words(big_docs), "word"),
        "bpe_merges": lambda: bpe.bpe_train(docs),
        "html_extract_turns": lambda: htmlops.extract_html_turns(big_docs),
        "asof_join": lambda: relops.asof_join(t("events")),
        "sessionize": lambda: relops.sessionize(t("events")),
        "url_dedup": lambda: urlops.url_dedup(urlops.documents_as_urls(big_docs)),
        "gopher_quality": lambda: textops.gopher_quality(big_docs),
        "repetition_stats": lambda: textops.repetition_stats(big_docs),
        "pii_scrub": lambda: textops.pii_scrub(big_docs),
        "baseline_ann_cosine_topk": lambda: simsearch.baseline_ann_topk(
            t("embeddings")
        ),
        "ann_ivf_topk": lambda: simsearch.ivf_topk(t("embeddings")),
        "ann_ivf_train": lambda: simsearch.ivf_train(t("embeddings")),
        "ann_ivf_topk_trained": lambda: simsearch.ivf_topk_trained(t("embeddings")),
        "baseline_cosine_neardup_blocked": lambda: simsearch.cosine_neardup_blocked(
            t("embeddings")
        ),
        "cosine_neardup_lsh": lambda: simsearch.cosine_neardup_lsh(
            docs, t("embeddings"), threshold=0.05
        ),
        "neardup_clusters": lambda: simsearch.neardup_clusters(t("documents")),
        "semdedup": lambda: simsearch.semdedup(t("embeddings"), n_cells="auto"),
        "segment_dedup": lambda: textops.segment_dedup(big_docs),
        "mixture_sample": lambda: textops.mixture_sample(big_src),
        "pack_sequences": lambda: textops.pack_sequences(big_src),
        "dsir_select": lambda: textops.dsir_select(
            big_src, big_src.where("source = 'src0'")
        ),
        "leakage_safe_split": lambda: textops.leakage_safe_split(big_src),
        "dsir_select_threshold": lambda: textops.dsir_select_threshold(
            big_src, big_src.where("source = 'src0'"), min_score=-20
        ),
        "bm25_topk": lambda: textops.bm25_topk(big_src),
        "kcenter_select": lambda: simsearch.kcenter_select(t("embeddings")),
        "rrf_fuse_ann": lambda: simsearch.rrf_fuse(
            simsearch.ivf_topk(t("embeddings")),
            simsearch.ivf_topk_trained(t("embeddings")),
        ),
        "training_corpus_v4": lambda: simsearch.training_corpus_v4(
            docs, t("embeddings"), docs
        ),
        "training_corpus_v5": lambda: simsearch.training_corpus_v5(
            docs, t("embeddings"), docs,
            docs.where("source = 'src0'").select("doc_id", "text"),
        ),
        "o5_interval_union": lambda: relops.interval_union(t("orders")),
        "j1_first_wins": lambda: relops.first_wins_fill(t("lineitem")),
        "extract_skew_unsalted": lambda: extract_fused(
            skewed().repartition(CPUS * 2, F.col("conv_id"))
        ),
        "extract_skew_salted": lambda: extract_fused(skewed(), repartition=CPUS * 2),
    }


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    want = os.environ.get("QUERIES", "all")
    spark = build_session(app="sparkextract-bench-extra", master=MASTER)
    try:
        b = builders(spark)
        names = list(b) if want == "all" else [q.strip() for q in want.split(",")]
        # warm-up (same as bench.py)
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        min_slice(docs.limit(50)).write.mode("overwrite").format("noop").save()
        out = {}
        for name in names:
            build = b[name]
            if PLAN_TAG:
                os.makedirs(PLAN_DIR, exist_ok=True)
                with open(os.path.join(PLAN_DIR, f"{name}_{PLAN_TAG}.txt"), "w") as f:
                    f.write(_plan(build()))
            runs = []
            for i in range(REPEAT):
                if name == "extract_staged":
                    # mirror bench.py clear_cache=True: the staged engine's
                    # INTERNAL persist would otherwise serve reps 2..n warm.
                    # Never blanket-clear: the skew pair's persisted input
                    # must stay cached (as in bench.py).
                    spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{name} rep{i}")
                t0 = time.perf_counter()
                build().write.mode("overwrite").format("noop").save()
                runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            out[name] = {
                "median": round(statistics.median(runs), 3),
                "runs": runs,
            }
            print(json.dumps({name: out[name]}), flush=True)
        print(json.dumps({
            "total_median": round(sum(v["median"] for v in out.values()), 3),
            "sf_dir": SF_DIR, "master": MASTER, "repeat": REPEAT,
        }), flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
