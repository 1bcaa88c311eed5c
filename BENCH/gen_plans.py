import sys
sys.path.insert(0, "/root/repo")
from sparkextract.session import build_session
from sparkextract import synth, pipeline, schema, textops, simsearch, htmlops, urlops, relops, sketches
from sparkextract.fused import extract_fused
from sparkextract.minslice import min_slice

spark = build_session(master="local[4]", shuffle_partitions=4)
pdf = synth.gen_transcripts(n_convs=4, seed=3)
src = "/tmp/plans_transcripts.parquet"
spark.createDataFrame(pdf, schema=schema.TRANSCRIPTS).write.mode("overwrite").parquet(src)
t = spark.read.parquet(src)
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

def plan(df):
    s = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    return s.split("\n\n")[0]  # tree only

sections = [
    ("Fused extraction pipeline (production path)", extract_fused(t),
     "One narrow MapInPandas + the single O8 window exchange. This is the plan that runs at 10^12 turns."),
    ("Staged extraction pipeline (relational operator showcase)", pipeline.extract(t),
     "Every operator visible: OCR fold (FlatMapGroupsInPandas), J1 theta join + first-wins window, A2 fold, ordered aggregation. InMemoryTableScans are the persisted fan-out nodes."),
    ("Catalyst-only minimum slice", min_slice(docs),
     "100% whole-stage-codegen: parse -> conf filter -> abandon anti-join -> reading order -> ordered concat. No Python anywhere."),
    ("MinHash signatures", textops.minhash_signature(docs),
     "One shuffle; 8 parallel MIN aggregates with map-side combine."),
    ("ANN top-k (ground-truth baseline)", simsearch.baseline_ann_topk(emb),
     "Brute-force baseline, r6 form: the corpus-side scan feeds ONE "
     "MapInPandas doing an exact int64 GEMM against the closure-shipped "
     "query matrix (no nested-loop join, no per-pair HOF); cost stays "
     "linear in corpus x queries. Ragged/oversized workloads fall back "
     "to the broadcast nested-loop form. The scale path is ivf_topk."),
    ("Production near-dup (LSH candidates -> exact cosine verify)",
     simsearch.cosine_neardup_lsh(docs, emb),
     "Every join is keyed (band/bucket equi-join, then vec_id fetches) - "
     "no BroadcastNestedLoopJoin anywhere, unlike the all-pairs baselines."),
    ("Multi-probe trained-IVF ANN (nprobe=3)",
     simsearch.ivf_topk_trained(emb, nprobe=3),
     "The recall lever: r6 computes assignment AND the 3-cell probe list "
     "in one narrow numpy matmul pass per side (MapInPandas; centroids "
     "ship in the closure, bounded by the k*dim budget) - the exploded "
     "centroid broadcast join and per-vector window exist only in the "
     "ragged/over-budget fallback. Candidate volume is 3n/cells per "
     "query, never all-pairs."),
    ("Bigram-LM surprisal quality filter (r4)",
     textops.bigram_lm_score(docs),
     "Integer-surprisal perplexity proxy, r6 one-pass form: the "
     "(doc,gram) pre-agg rides an explicit gram-keyed exchange, c12 is "
     "a window SUM on that same partitioning and c1 one w1-keyed "
     "window away - one corpus pass, three exchanges, zero joins "
     "(was three passes and two joins). ilog2 runs as conv(n,10,2) "
     "string length - pure codegen, no Python, no log()."),
    ("tf-idf top-k terms per doc (r4)",
     textops.tfidf_topk(docs),
     "r6: df is a window COUNT on the word-keyed exchange the (doc, "
     "word) pre-agg already rides - no second pass, no df join; the "
     "only nested-loop is the broadcast of the literal one-row corpus "
     "count; one per-doc top-k window."),
    ("Gopher quality gate + PII scrub fused on one scan (map-only)",
     textops.pii_scrub(
         docs.where(textops._gopher_pass_col()).select("doc_id", "text")
     ),
     "Both text filters are pure scalar regexp/length expressions: the "
     "gopher_pass predicate and the scrub projection fuse into ONE "
     "Project+Filter over the parquet scan with zero exchanges - at "
     "100 TB this pass is bandwidth-bound, never shuffle-bound."),
    ("Repetition stats (Gopher repetition filters)",
     textops.repetition_stats(docs),
     "r6: every statistic is a per-document function of the text, so "
     "the whole operator is ONE narrow MapInPandas pass emitting "
     "integer stats - zero exchanges, zero joins; the fractions stay "
     "in Catalyst so ROUND keeps pinned HALF_UP semantics."),
    ("HTML main-content extraction (relational, zero-shuffle)",
     htmlops.html_main_content(htmlops.documents_as_html(docs)),
     "The entire extractor - block split, per-block link-density "
     "scoring, keep-fold - is per-row higher-order functions: ONE "
     "Project over the scan, zero exchanges. The DOM variant is the "
     "same shape with MapInPandas in place of the Project."),
    ("URL canonicalization + crawl dedup",
     urlops.url_dedup(urlops.documents_as_urls(docs)),
     "Canonicalization is scalar expressions fused into the scan; the "
     "dedup groupBy on canonical_url is the single combinable "
     "exchange."),
    ("As-of join (union + window phrasing)",
     relops.asof_join(spark.read.parquet("/root/testdata/sf0.001/events.parquet")),
     "No range or nested-loop join: both sides union into ONE user_id "
     "exchange, then a running last-non-null picks the most recent "
     "at-or-before update. Cost is independent of how many events each "
     "update covers."),
    ("HLL distinct-count sketch registers",
     sketches.hll_registers(
         textops.words(docs), "word"),
     "Map-side rho/bucket math, then a partial+final agg on a 256-key "
     "space: the shuffle carries at most 256 rows per map task. "
     "Registers from disjoint shards merge by MAX."),
    ("End-to-end training-data pipeline (extract -> dedup -> gate -> tokens)",
     textops.training_corpus(docs),
     "Composition stays keyed: the extraction aggregation, the LSH "
     "bucket join inside neardup_clusters (materialized by its driver "
     "loop), and one representatives join; the quality gate and token "
     "counts are whole-stage-codegen'd expressions on the join output."),
    ("Segment-level corpus dedup (r4)",
     textops.segment_dedup(docs),
     "The corpus text shuffles ONCE keyed by md5(segment) - uniform, "
     "skew-free - where a row_number window picks the first "
     "occurrence; reassembly is a doc_id-keyed ordered collect and the "
     "map-side ceil-div total joins back doc_id-keyed. No nested-loop "
     "anywhere."),
    ("Temperature mixture sampling (r4)",
     textops.mixture_sample(docs),
     "One combinable per-source count (|sources| rows), the quota "
     "table broadcast back, then a MAP-ONLY md5-prefix filter fused "
     "into the scan: the corpus itself never shuffles and there is no "
     "window - at 100 TB this is a bandwidth-bound single pass."),
    ("Sequence packing manifest (r4)",
     textops.pack_sequences(docs),
     "ONE exchange total: the per-source running-sum window partitions "
     "on source, and the final (source, seq_bin) aggregation reuses "
     "that partitioning (source is a prefix of the grouping key), so "
     "Catalyst plans no second shuffle - plan-guarded by test."),
    ("DSIR selection, production threshold form (r5)",
     textops.dsir_select_threshold(
         docs, docs.where("source = 'src0'"), min_score=-20
     ),
     "Two combinable 256-row feature-count aggs (r6: checkpointed once "
     "- the RDD scans in the plan - so the gram explode runs once, "
     "not 3x), the delta table and one-row totals broadcast onto the "
     "gram stream, one combinable doc_id agg, then a MAP-ONLY "
     "threshold compare - no rank window anywhere (the exact-rank "
     "form adds exactly one column-pruned single-partition window)."),
    ("Leakage-safe train/val split (r5)",
     textops.leakage_safe_split(docs),
     "Zero exchanges: two md5s and a string compare fused into the "
     "parquet scan - the whole operator is one Project. Content-keyed, "
     "so duplicate co-assignment costs nothing."),
    ("BM25 ranked retrieval (r5)",
     textops.bm25_topk(docs),
     "r6: dl and every per-term tf ride ONE combinable per-doc wide "
     "aggregate (checkpointed - the RDD scan in the plan); df and the "
     "totals are tiny aggregates over it, broadcast back, and the "
     "tf-dl join is gone (dl sits on the tf row). Top-k shares dsir's "
     "single-partition (doc_id, score) window with the documented "
     "sketch swap."),
    ("Reciprocal-rank fusion of two IVF retrievers (r5)",
     simsearch.rrf_fuse(simsearch.ivf_topk(emb),
                        simsearch.ivf_topk_trained(emb)),
     "Fusion operates on the two bounded top-k-per-query tables: a "
     "(q_id, n_id) full-outer merge plus one per-query rank window - "
     "cost is queries x k regardless of corpus size, so the retrieval "
     "stages always dominate."),
]
out = ["# PLANS — physical plans of the headline jobs",
       "",
       "Captured from `.explain('formatted')` (tree section) on Spark 4.1.2",
       "with AQE on. Regenerate: `python BENCH/gen_plans.py`.", ""]
for title, df, note in sections:
    out.append(f"## {title}\n\n{note}\n\n```\n{plan(df)}\n```\n")
open("/root/repo/PLANS.md", "w").write("\n".join(out))
print("written")
spark.stop()
