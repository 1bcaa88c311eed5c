"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline over sf0.001 documents
wrapped into the transcripts shape; ``queries``/``oracle_sql`` cover the
SURVEY.md §2 operator inventory (SQL-expressible phrasings per
FIXTURES.md §5) plus the training-data ops (dedup, similarity search,
text analysis). Every computed column is aliased identically on both
sides; hashing/quantization is engine-portable by construction (md5 hex
strings, integer arithmetic, double math over exact ints only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkextract import (  # noqa: E402
    bpe,
    htmlops,
    relops,
    simsearch,
    sketches,
    tasks,
    textops,
    urlops,
    viz,
)
from sparkextract.docsource import documents_as_transcripts  # noqa: E402
from sparkextract.fused import extract_fused  # noqa: E402
from sparkextract.minslice import min_slice, min_slice_sql  # noqa: E402
from sparkextract.pipeline import extract  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _formula_recognition_sql() -> str:
    from sparkextract.mfr import formula_recognition_sql

    return formula_recognition_sql()


def _extract_sql() -> str:
    from sparkextract.e2e_sql import extract_sql

    return extract_sql()


def _canonical_extract(df: DataFrame) -> DataFrame:
    """Project extracted output to the driver-compare shape: spans_fp is a
    canonical rendering (integer centi-unit coords/scores, '|' fields,
    chr(31) between spans) identical to e2e_sql._span_render — Spark's
    to_json float formatting would not hash-match another engine."""
    def render(sp):
        centi = lambda v: (v * 100).cast("bigint")  # noqa: E731
        return F.concat_ws(
            "|", sp["type"],
            centi(sp["x0"]), centi(sp["y0"]), centi(sp["x1"]), centi(sp["y1"]),
            sp["content"], F.round(sp["score"] * 100).cast("bigint"),
        )

    return df.select(
        "conv_id", "turn_idx", "turn_seq", "main_text",
        F.md5(F.array_join(F.transform("spans", render), "\x1f")).alias("spans_fp"),
    )


def _ocr_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkextract.ocr import ocr_crop_assign
    from sparkextract.parse import parse_detections

    return ocr_crop_assign(
        parse_detections(documents_as_transcripts(_t(spark, sf_dir, "documents")))
    )


def _pii_injected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with one deterministic PII token appended per doc (by
    doc_id mod 3: email / phone / IPv4) — the scrub operator under test
    is generic; the injection only makes the driver row non-vacuous."""
    docs = _t(spark, sf_dir, "documents")
    inj = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" reach user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(F.col("doc_id") % 3 == 1, F.lit(" call 555-0199 today"))
        .otherwise(F.lit(" host 10.0.0.7 up"))
    )
    return docs.select("doc_id", F.concat("text", inj).alias("text"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline on sf0.001 documents-as-transcripts."""
    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    return extract(documents_as_transcripts(docs)).select(
        "conv_id", "turn_idx", "turn_seq", "main_text", "spans"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Dict INSERTION ORDER is load-bearing: the driver's correctness
    gate samples the FIRST 50 entries. Since round 5 the order is
    computed (``_window_order``): ``_PINNED`` (the flagship, every
    task_*, the capstones, and everything whose implementation or twin
    changed in the current round) always leads; the remaining window
    slots CYCLE through ``_ROTATING`` so every long-stable query regains
    a fresh driver-green row every ~2 rounds (round-5 VERDICT item 4;
    rotation rule documented in CLAUDE.md). The literal below stays in
    thematic registry order — do not re-sort it; adjust _PINNED/_ROUND
    instead."""
    q = {
        # --- flagship: full e2e extraction, FULLY ORACLED (e2e_sql.extract_sql
        # composes the NMS/OCR/F1 recursive-CTE twins with relational
        # J1/A2/A3/A4). main_text compared byte-for-byte; spans pinned via
        # a canonical engine-portable rendering (spans_fp) because Spark's
        # to_json float formatting is not reproducible elsewhere. The golden
        # suite (tests/test_e2e_golden.py vs tests/oracle.py vs the ACTUAL
        # reference fns) remains the primary semantic anchor ---
        "extract_pipeline": lambda s, d: _canonical_extract(
            extract(documents_as_transcripts(_t(s, d, "documents")))
        ),
        "extract_fused": lambda s, d: _canonical_extract(
            extract_fused(documents_as_transcripts(_t(s, d, "documents")))
        ),
        # --- per-task APIs (reference scripts/ analogs) ---
        "task_layout_detection": lambda s, d: tasks.layout_detection(
            documents_as_transcripts(_t(s, d, "documents"))
        ),
        # M4 formula detection (branch 1, conf + NMS + F6/F7)
        "task_formula_detection": lambda s, d: tasks.formula_detection(
            documents_as_transcripts(_t(s, d, "documents"))
        ),
        # M2 second layout model (LayoutLMv3-style raw output, class ids)
        "task_layout_detection_v2": lambda s, d: tasks.layout_detection_lmv3(
            documents_as_transcripts(_t(s, d, "documents"))
        ),
        # S6 visualization sink: per-page SVG of the layout detections
        "task_visualization": lambda s, d: viz.visualize_svg(
            tasks.layout_detection(documents_as_transcripts(_t(s, d, "documents")))
        ),
        "task_ocr_spans": lambda s, d: tasks.ocr(
            documents_as_transcripts(_t(s, d, "documents"))
        ),
        # P1 + the OCR containment join: SQL-expressible prefix of M9
        "task_ocr_crop_assign": lambda s, d: _ocr_crop(s, d),
        "task_formula_recognition": lambda s, d: tasks.formula_recognition(
            documents_as_transcripts(_t(s, d, "documents"))
        ),
        # M10 table parsing (deterministic StructEqTable stand-in)
        "task_table_parsing": lambda s, d: tasks.table_parsing(
            documents_as_transcripts(_t(s, d, "documents"))
        ),
        # --- composed training-data pipelines ---
        # SemDedup (Abbas+23): embedding-space dedup — IVF-blocked cosine
        # pairs -> connected components -> one representative per cluster
        "semdedup": lambda s, d: simsearch.semdedup(_t(s, d, "embeddings")),
        # the composed modern pipeline: gopher gate -> PII scrub ->
        # semantic dedup -> exact dedup -> tokens (PII-injected corpus so
        # the scrub stage is non-vacuous)
        "training_corpus_v2": lambda s, d: simsearch.training_corpus_v2(
            _pii_injected(s, d), _t(s, d, "embeddings")
        ),
        # v3 capstone: + classifier gate and training-window chunking;
        # output = per-CHUNK rows with md5-pinned chunk text
        "training_corpus_v3": lambda s, d: simsearch.training_corpus_v3(
            _pii_injected(s, d), _t(s, d, "embeddings")
        ),
        # round-4 v4 capstone: v3's gate/scrub/dedup chain + segment
        # dedup + alpha=0.5 mixture sampling + sequence-packing
        # assignment; source column joins in from the raw documents table
        "training_corpus_v4": lambda s, d: simsearch.training_corpus_v4(
            _pii_injected(s, d),
            _t(s, d, "embeddings"),
            _t(s, d, "documents"),
        ),
        # round-5 capstone: v4 chain + map-only DSIR domain gate (scored
        # vs the raw src0 slice) + content-keyed train/val split — the
        # corpus MANIFEST with selected flag, not a filtered view
        "training_corpus_v5": lambda s, d: simsearch.training_corpus_v5(
            _pii_injected(s, d),
            _t(s, d, "embeddings"),
            _t(s, d, "documents"),
            _t(s, d, "documents").where("source = 'src0'").select(
                "doc_id", "text"
            ),
        ),
        # END-TO-END training-data path: extraction -> near-dup dedup ->
        # quality gate -> token accounting, text pinned by md5
        "pipeline_dedup_extract": lambda s, d: textops.training_corpus(
            _t(s, d, "documents")
        ),
        # benchmark decontamination: corpus docs sharing any 3-gram with
        # the eval slice (doc_id % 50 == 0) are flagged (GPT-3 app. C rule)
        "decontaminate": lambda s, d: textops.decontaminate(
            _t(s, d, "documents").where(F.col("doc_id") % 50 != 0),
            _t(s, d, "documents").where(F.col("doc_id") % 50 == 0),
        ),
        # round-4 cross-corpus dedup (Dolma shape: new dump vs existing
        # corpus — doc_id % 4 == 0 plays the existing corpus): exact
        # anti-join survivors, and LSH bucket-join near-dup flags
        "dedup_against": lambda s, d: textops.dedup_against(
            _t(s, d, "documents").where(F.col("doc_id") % 4 != 0),
            _t(s, d, "documents").where(F.col("doc_id") % 4 == 0),
        ),
        "neardup_against": lambda s, d: textops.neardup_against(
            _t(s, d, "documents").where(F.col("doc_id") % 4 != 0),
            _t(s, d, "documents").where(F.col("doc_id") % 4 == 0),
        ),
        # --- near-dup dedup over embeddings / similarity search ---
        # production path: LSH candidates over text -> exact cosine verify.
        # threshold 0.05 (not the 0.35 default): synthetic text-similarity is
        # uncorrelated with embedding-similarity, so a loose verify keeps the
        # driver row non-vacuous (10 verified pairs at sf0.01)
        "cosine_neardup_lsh": lambda s, d: simsearch.cosine_neardup_lsh(
            _t(s, d, "documents"), _t(s, d, "embeddings"), threshold=0.05
        ),
        # embedding-space blocking: trained-IVF nprobe cells -> exact verify
        # (the semantic complement to cosine_neardup_lsh's text blocking)
        "cosine_neardup_ivf": lambda s, d: simsearch.cosine_neardup_ivf(
            _t(s, d, "embeddings")
        ),
        "neardup_clusters": lambda s, d: simsearch.neardup_clusters(
            _t(s, d, "documents")
        ),
        # deduped corpus: one representative per near-dup cluster
        "dedup_representatives": lambda s, d: simsearch.dedup_keep_representatives(
            _t(s, d, "documents")
        ),
        # O(n²) all-pairs variants: CORRECTNESS BASELINES ONLY, prefixed so
        # no unlabeled all-pairs plan is reachable as a first-class API;
        # the production near-dup path is cosine_neardup_lsh
        "baseline_cosine_neardup": lambda s, d: simsearch.cosine_neardup(
            _t(s, d, "embeddings")
        ),
        "baseline_cosine_neardup_blocked": lambda s, d: simsearch.cosine_neardup_blocked(
            _t(s, d, "embeddings")
        ),
        # composed production ANN: trained centroids -> cell-probe top-k
        "ann_ivf_topk_trained": lambda s, d: simsearch.ivf_topk_trained(
            _t(s, d, "embeddings")
        ),
        # multi-probe: queries search their 3 closest cells — the recall
        # lever (BENCH/BASELINE.md §recall) at candidate cost 3·n/cells
        "ann_ivf_topk_nprobe": lambda s, d: simsearch.ivf_topk_trained(
            _t(s, d, "embeddings"), nprobe=3
        ),
        # IVF centroid TRAINING (Lloyd k-means, exact integer assignment)
        "ann_ivf_train": lambda s, d: simsearch.ivf_train(_t(s, d, "embeddings")),
        "ann_ivf_topk": lambda s, d: simsearch.ivf_topk(_t(s, d, "embeddings")),
        # brute-force exact top-k: the ground-truth BASELINE (fixed small
        # query workload only — the query side grows with n, so this is not
        # a production plan; see simsearch.baseline_ann_topk docstring)
        "baseline_ann_cosine_topk": lambda s, d: simsearch.baseline_ann_topk(
            _t(s, d, "embeddings")
        ),
        # round-5: greedy k-center diversity selection (Gonzalez 85 /
        # Sener&Savarese 18 coresets) — exact-int max-min L2, one narrow
        # pass + TakeOrdered(1) per round; semdedup's diversity complement
        "kcenter_select": lambda s, d: simsearch.kcenter_select(
            _t(s, d, "embeddings")
        ),
        # round-5: reciprocal-rank fusion (Cormack+09) ensembling the
        # untrained and trained IVF retrievers — integer-truncated
        # 1e6 div (60+rank) contributions, full-outer on bounded top-k sets
        "rrf_fuse_ann": lambda s, d: simsearch.rrf_fuse(
            simsearch.ivf_topk(_t(s, d, "embeddings")),
            simsearch.ivf_topk_trained(_t(s, d, "embeddings")),
        ),
        # --- crawl-style URL ops (synthetic URLs per doc: five surface
        # variants per canonical form, so every normalization rule is
        # load-bearing — 500 raw urls collapse to 280 canonical) ---
        "url_canonicalize": lambda s, d: urlops.canonical_url(
            urlops.documents_as_urls(_t(s, d, "documents"))
        ),
        "url_dedup": lambda s, d: urlops.url_dedup(
            urlops.documents_as_urls(_t(s, d, "documents"))
        ),
        "url_domain_stats": lambda s, d: urlops.domain_stats(
            urlops.documents_as_urls(_t(s, d, "documents"))
        ),
        # crawl deny-list: broadcast LEFT ANTI on canonical host
        "blocklist_filter": lambda s, d: relops.blocklist_filter(
            urlops.documents_as_urls(_t(s, d, "documents")),
            s.createDataFrame(
                [("example1.com",), ("example4.com",)], "host string"
            ),
        ),
        # BPE tokenizer training over the word-frequency table (8 merge
        # rounds, bounded driver loop like ivf_train; unrolled SQL twin)
        "bpe_merges": lambda s, d: bpe.bpe_train(_t(s, d, "documents")),
        # the trained tokenizer applied back to the vocabulary: per-word
        # symbol counts after all 8 merges (compression evidence)
        "bpe_vocab": lambda s, d: bpe.bpe_vocab(_t(s, d, "documents")),
        # --- HTML main-content extraction (north_rule: boilerplate strip +
        # DOM heuristics). Pages synthesized deterministically per document
        # (htmlops.HTML_TEMPLATE — same template builds the DuckDB expr) ---
        # relational path: zero-shuffle HOF block scoring (len + link density)
        "html_main_content": lambda s, d: htmlops.html_main_content(
            htmlops.documents_as_html(_t(s, d, "documents"))
        ),
        # per-block audit view of the keep rule
        "html_block_stats": lambda s, d: htmlops.html_block_stats(
            htmlops.documents_as_html(_t(s, d, "documents"))
        ),
        # real streaming DOM pass (html.parser via mapInPandas); equals the
        # relational path on well-formed input, so it shares the SQL twin
        "html_dom_extract": lambda s, d: htmlops.html_dom_extract(
            htmlops.documents_as_html(_t(s, d, "documents"))
        ),
        # north-rule shape on the HTML axis: per-TURN extraction + the one
        # conv_id ordering window (same census as the fused PDF pipeline)
        "html_extract_turns": lambda s, d: htmlops.extract_html_turns(
            _t(s, d, "documents")
        ),
        # --- text dedup / fingerprinting ---
        "lsh_candidate_pairs": lambda s, d: textops.lsh_candidate_pairs(_t(s, d, "documents")),
        # round-4: CCNet/RefinedWeb segment-level corpus dedup — every
        # 32-word segment keeps its first (doc_id, seg_idx) occurrence,
        # docs reassembled from survivors; ONE content-keyed shuffle
        "segment_dedup": lambda s, d: textops.segment_dedup(
            _t(s, d, "documents")
        ),
        # round-4: α=0.5 temperature mixture sampling (GPT-3/PaLM source
        # reweighting) — integer quota rule + map-only md5-prefix keep
        "mixture_sample": lambda s, d: textops.mixture_sample(
            _t(s, d, "documents")
        ),
        # round-4: concat-and-split sequence packing manifest (per-source
        # running word sum -> fixed 256-word training bins)
        "pack_sequences": lambda s, d: textops.pack_sequences(
            _t(s, d, "documents")
        ),
        # round-5: DSIR importance-resampling selection (Xie+23) — hashed
        # n-gram importance vs the src0 target slice, exact-int ilog2
        # scoring, deterministic top-25% (noise-free Gumbel limit)
        "dsir_select": lambda s, d: textops.dsir_select(
            _t(s, d, "documents"),
            _t(s, d, "documents").where("source = 'src0'"),
        ),
        # round-5: the PRODUCTION DSIR form — same scoring chain, rank
        # window replaced by a map-only threshold compare (the 100 TB
        # swap made concrete; -20 sits mid-distribution at both SFs)
        "dsir_select_threshold": lambda s, d: textops.dsir_select_threshold(
            _t(s, d, "documents"),
            _t(s, d, "documents").where("source = 'src0'"),
            min_score=-20,
        ),
        # round-5: content-keyed train/val split — byte-identical texts
        # can never straddle the split (Lee+22 eval-leakage); map-only
        "leakage_safe_split": lambda s, d: textops.leakage_safe_split(
            _t(s, d, "documents")
        ),
        # round-5: BM25 ranked retrieval (Robertson&Zaragoza 09) — the
        # lexical counterpart of the ANN stack, fixed-point integer
        # scoring (22·idf·tf·W·10^6 div cleared-denominator), ilog2 idf
        "bm25_topk": lambda s, d: textops.bm25_topk(_t(s, d, "documents")),
        # banded-Hamming SimHash near-dup (4x4-bit bands, verify <= 3)
        "simhash_neardup": lambda s, d: textops.simhash_neardup(
            _t(s, d, "documents")
        ),
        "ngram_jaccard": lambda s, d: textops.ngram_jaccard_pairs(_t(s, d, "documents")),
        # exact duplicated-substring spans (Lee+22 suffix-array dedup,
        # distributed phrasing: dup-flag count + gaps-and-islands merge)
        "substring_dup_spans": lambda s, d: textops.substring_dup_spans(
            _t(s, d, "documents")
        ),
        # winnowing (SIGMOD'03): w-window minima of k-gram hashes
        "winnow_fingerprints": lambda s, d: textops.winnow_fingerprints(
            _t(s, d, "documents")
        ),
        # non-default k exercises the generalized k-gram builder
        # (round-2 ADVICE: k was silently pinned to 3)
        "winnow_fingerprints_k4": lambda s, d: textops.winnow_fingerprints(
            _t(s, d, "documents"), k=4, w=5
        ),
        # round-4: perplexity-proxy LM quality filter (CCNet family) —
        # corpus-trained bigram model, INTEGER surprisal (exact ilog2 via
        # binary-string length, no transcendental divergence)
        "bigram_lm_score": lambda s, d: textops.bigram_lm_score(
            _t(s, d, "documents")
        ),
        # round-4: per-doc top-k characteristic terms, ratio-idf tf-idf
        # (exact ints + one IEEE division; log idf isn't engine-portable)
        "tfidf_topk": lambda s, d: textops.tfidf_topk(_t(s, d, "documents")),
        # ==================== position 51+ below: long-stable rows, ====
        # ==================== driver-green in r03 ======================
        # fasttext/DCLM-style linear quality classifier: hashed-ngram
        # features x broadcast integer weight table, exact-int score
        # (also exercised in-window as a training_corpus_v3/v4 stage)
        "quality_classifier": lambda s, d: textops.quality_classifier(
            _t(s, d, "documents")
        ),
        # LM training-window chunking (overlapping word windows, narrow plan)
        "chunk_documents": lambda s, d: textops.chunk_documents(
            _t(s, d, "documents")
        ),
        # corpus vocabulary: word -> tf + df (tokenizer/vocab training input)
        "vocab_stats": lambda s, d: textops.vocab_stats(_t(s, d, "documents")),
        # exact per-source length quantiles (nearest-rank; no approx)
        "length_quantiles": lambda s, d: textops.length_quantiles(
            _t(s, d, "documents")
        ),
        # PII redaction over a deterministically-injected corpus (the synth
        # documents carry no PII; injection makes the driver row non-vacuous)
        "pii_scrub": lambda s, d: textops.pii_scrub(_pii_injected(s, d)),
        # demoted round 4 (green in r03, code untouched since) to make
        # window room for segment_dedup/mixture_sample/pack_sequences
        "minhash_signature": lambda s, d: textops.minhash_signature(_t(s, d, "documents")),
        "simhash": lambda s, d: textops.simhash(_t(s, d, "documents")),
        "doc_fingerprint": lambda s, d: textops.fingerprint(_t(s, d, "documents")),
        # Gopher-style rules (Rae et al. 2021): quality band + repetition
        "gopher_quality": lambda s, d: textops.gopher_quality(_t(s, d, "documents")),
        "repetition_stats": lambda s, d: textops.repetition_stats(
            _t(s, d, "documents")
        ),
        # HLL register table (mergeable distinct-count sketch state) over
        # the corpus vocabulary; integers only, tiny combinable shuffle
        "hll_words": lambda s, d: sketches.hll_registers(
            textops.words(_t(s, d, "documents")), "word"
        ),
        # count-min sketch state (SUM-mergeable word-frequency counters)
        "cms_words": lambda s, d: sketches.cms_registers(
            textops.words(_t(s, d, "documents")), "word"
        ),
        # deterministic 10% corpus sample (hash-threshold; same rows at
        # any parallelism / engine / run — rand() can't promise that)
        "hash_sample_docs": lambda s, d: sketches.hash_sample(
            _t(s, d, "documents"), "doc_id", 0.10
        ).select("doc_id", "n_chars"),
        "dedup_exact": lambda s, d: textops.exact_dedup(_t(s, d, "documents")),
        "lang_id_ngram": lambda s, d: textops.lang_id_ngram(_t(s, d, "documents")),
        "quality_score": lambda s, d: textops.quality_score(_t(s, d, "documents")),
        "token_count": lambda s, d: textops.token_count(_t(s, d, "documents")),
        "extract_min_slice": lambda s, d: min_slice(_t(s, d, "documents")),
        # as-of join (union+window scale phrasing; oracle = DuckDB's
        # NATIVE ASOF JOIN — an independent implementation)
        "asof_join": lambda s, d: relops.asof_join(_t(s, d, "events")),
        # event-time sessionization (30-min gap gaps-and-islands)
        "sessionize": lambda s, d: relops.sessionize(_t(s, d, "events")),
        # Spark's NATIVE session_window rollup, oracled by the independent
        # gaps-and-islands derivation (boundary: end-exclusive, >= gap)
        "session_window_agg": lambda s, d: relops.session_window_agg(
            _t(s, d, "events")
        ),
        # --- extraction operators (SURVEY.md §2), generic phrasings ---
        "o1_reading_order": lambda s, d: relops.reading_order(_t(s, d, "events")),
        "o5_interval_union": lambda s, d: relops.interval_union(_t(s, d, "orders")),
        "j1_first_wins": lambda s, d: relops.first_wins_fill(_t(s, d, "lineitem")),
        "f2_lang_detect": lambda s, d: relops.lang_detect(_t(s, d, "documents")),
        "f3_md_escape": lambda s, d: relops.md_escape_prefix(_t(s, d, "documents")),
        "p5_boilerplate_emit": lambda s, d: relops.boilerplate_emit(_t(s, d, "events")),
        "p2_a1_conf_envelope": lambda s, d: relops.conf_envelope(_t(s, d, "lineitem")),
        "f9_page_id": lambda s, d: relops.page_id_format(_t(s, d, "events")),
        "p6_geometry_normalize": lambda s, d: relops.geometry_normalize(_t(s, d, "lineitem")),
        "f6_f7_trunc_round": lambda s, d: relops.trunc_round(_t(s, d, "lineitem")),
    }
    order = _window_order(set(q))
    return {name: q[name] for name in order}


# --- driver-window rotation (round-5 VERDICT item 4) -----------------------
# The driver's correctness gate checks only the FIRST 50 queries() entries.
# _PINNED entries hold a window slot EVERY round: the flagship pair, all
# task_* APIs, the four composed capstones, plus whatever changed in the
# CURRENT round (round 5: the auto-nprobe semdedup/IVF chain and the two
# round-5 twin fixes — dedup_against NOT EXISTS, mixture_sample rate cast).
# The remaining 50 - len(_PINNED) slots cycle through _ROTATING, advancing
# by the window size each round (_ROUND is bumped when the round starts),
# so every long-stable query regains a FRESH driver-green row every
# ceil(len(_ROTATING) / (50 - len(_PINNED))) ≈ 2 rounds. _ROTATING leads
# with the 31 rows that sat OUTSIDE the r04 window (stalest coverage
# first); the 30 rows that were green in r04 follow.

_ROUND = 6

_PINNED = [
    "extract_pipeline", "extract_fused",
    "task_layout_detection", "task_formula_detection",
    "task_layout_detection_v2", "task_visualization", "task_ocr_spans",
    "task_ocr_crop_assign", "task_formula_recognition", "task_table_parsing",
    "training_corpus_v2", "training_corpus_v3",
    "training_corpus_v4", "training_corpus_v5",
    # touched in round 6 (optimization round) — pinned per the rotation
    # rule: the numpy IVF train/probe chain, union-find components, the
    # capstone-chain checkpoints, and the one-pass textops plans
    "semdedup", "cosine_neardup_ivf", "pipeline_dedup_extract",
    "neardup_clusters", "dedup_representatives",
    "ann_ivf_train", "ann_ivf_topk_trained", "ann_ivf_topk_nprobe",
    "baseline_ann_cosine_topk",
    "dsir_select", "dsir_select_threshold", "bm25_topk", "rrf_fuse_ann",
    "kcenter_select",
    "bigram_lm_score", "tfidf_topk", "substring_dup_spans",
    "ngram_jaccard", "repetition_stats",
    "minhash_signature", "lsh_candidate_pairs", "cosine_neardup_lsh",
]

_ROTATING = [
    # --- stalest first (cycle position carries over round to round) ---
    "quality_classifier", "chunk_documents", "vocab_stats",
    "length_quantiles", "pii_scrub", "simhash",
    "doc_fingerprint", "gopher_quality", "hll_words",
    "cms_words", "hash_sample_docs", "dedup_exact", "lang_id_ngram",
    "quality_score", "token_count", "extract_min_slice", "asof_join",
    "sessionize", "session_window_agg", "o1_reading_order",
    "o5_interval_union", "j1_first_wins", "f2_lang_detect", "f3_md_escape",
    "p5_boilerplate_emit", "p2_a1_conf_envelope", "f9_page_id",
    "p6_geometry_normalize", "f6_f7_trunc_round",
    "decontaminate", "neardup_against",
    "baseline_cosine_neardup",
    "baseline_cosine_neardup_blocked", "ann_ivf_topk",
    "url_canonicalize", "url_dedup",
    "url_domain_stats", "blocklist_filter", "bpe_merges", "bpe_vocab",
    "html_main_content", "html_block_stats", "html_dom_extract",
    "html_extract_turns", "simhash_neardup",
    "winnow_fingerprints", "winnow_fingerprints_k4",
    # --- round-5 pins released this round (untouched in r6) ---
    "dedup_against", "mixture_sample", "segment_dedup", "pack_sequences",
    "leakage_safe_split",
]


def _window_order(all_names: set) -> list:
    """Window = _PINNED + the next (50 - len(_PINNED)) names of the
    _ROTATING cycle; everything else follows in cycle order."""
    assert set(_PINNED).isdisjoint(_ROTATING)
    assert set(_PINNED) | set(_ROTATING) == all_names, (
        sorted(all_names - set(_PINNED) - set(_ROTATING)),
        sorted((set(_PINNED) | set(_ROTATING)) - all_names),
    )
    take = 50 - len(_PINNED)
    # the rotation rule moves every touched query into _PINNED — guard the
    # day that overflows the window (take < 0 would silently shrink the
    # driver gate below 50 via cycled[:take])
    assert 0 <= take, f"_PINNED has {len(_PINNED)} entries, window is 50"
    start = ((_ROUND - 5) * take) % len(_ROTATING)
    cycled = _ROTATING[start:] + _ROTATING[:start]
    return _PINNED + cycled[:take] + cycled[take:]


def _winnow_sql(k: int, w: int) -> str:
    gram = " || ' ' || ".join(f"ws[pos + {j + 1}]" for j in range(k))
    return f"""
WITH sh0 AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT doc_id, CAST(pos AS INT) AS pos, md5({gram}) AS h
  FROM (SELECT doc_id, ws, unnest(range(0, len(ws) - {k - 1})) AS pos
        FROM sh0 WHERE len(ws) >= {k})
),
m AS (
  SELECT doc_id, pos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS fp
  FROM g
)
SELECT DISTINCT doc_id, fp FROM m WHERE pos >= {w - 1}
"""


def _substring_dup_sql(k: int) -> str:
    gram = " || ' ' || ".join(f"ws[pos + {j + 1}]" for j in range(k))
    return f"""
WITH sh0 AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT doc_id, CAST(pos AS INT) AS pos, md5({gram}) AS h
  FROM (SELECT doc_id, ws, unnest(range(0, len(ws) - {k - 1})) AS pos
        FROM sh0 WHERE len(ws) >= {k})
),
dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
flagged AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM flagged
)
SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start,
       CAST(MAX(pos) + {k} - 1 AS INT) AS span_end,
       CAST(MAX(pos) + {k} - MIN(pos) AS INT) AS n_words
FROM isl GROUP BY doc_id, grp
"""


def _simhash_sql(bits: int = 16) -> str:
    votes = ",\n         ".join(
        f"SUM(CASE WHEN substr(md5(word), {i + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS v{i}"
        for i in range(bits)
    )
    sig = " + ".join(f"CASE WHEN v{i} >= 0 THEN {1 << i} ELSE 0 END" for i in range(bits))
    return f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
v AS (
  SELECT doc_id,
         {votes}
  FROM w WHERE word <> '' GROUP BY doc_id
)
SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM v
"""


_SHINGLES = """
sh0 AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, GREATEST(len(ws) - 1, 1)),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
  FROM sh0 WHERE len(ws) >= 3
)
"""

_MINHASH = (
    "WITH "
    + _SHINGLES.strip()
    + """,
x AS (
  SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || shingle) AS h
  FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) seeds
),
sig AS (
  SELECT doc_id, CAST(seed AS INT) AS seed, MIN(h) AS minhash FROM x GROUP BY 1, 2
)
"""
)


_NEARDUP_CLUSTERS = (
    "WITH RECURSIVE "
    + _MINHASH[len("WITH ") :]
    + """,
b AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(minhash, '|' ORDER BY minhash)) AS bucket
  FROM sig GROUP BY doc_id, seed // 2
),
pairs AS (
  SELECT DISTINCT a.doc_id AS pa, b2.doc_id AS pb
  FROM b a JOIN b b2 USING (band, bucket)
  WHERE a.doc_id < b2.doc_id
),
edges AS (
  SELECT pa AS a, pb AS bb FROM pairs
  UNION ALL SELECT pb AS a, pa AS bb FROM pairs
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.bb FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS doc_id, MIN(dst) AS cluster FROM reach GROUP BY src
"""
)


def _band_cte(prefix: str, where: str) -> str:
    """MinHash-LSH band-bucket CTE chain over a FILTERED documents slice
    (cross-corpus twin building block); final CTE: {prefix}band."""
    return f"""{prefix}0 AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE {where}
),
{prefix}sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, GREATEST(len(ws) - 1, 1)),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
           AS shingle
  FROM {prefix}0 WHERE len(ws) >= 3
),
{prefix}x AS (
  SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || shingle) AS h
  FROM {prefix}sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) seeds
),
{prefix}sig AS (
  SELECT doc_id, CAST(seed AS INT) AS seed, MIN(h) AS minhash
  FROM {prefix}x GROUP BY 1, 2
),
{prefix}band AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(minhash, '|' ORDER BY minhash)) AS bucket
  FROM {prefix}sig GROUP BY doc_id, seed // 2
)"""


# SQL twin of _pii_injected (yields doc_id, text) — shared by the
# pii_scrub and training_corpus_v2 oracles
_PII_INJ_CTE = """SELECT doc_id,
         text || CASE WHEN doc_id % 3 = 0
                      THEN ' reach user' || CAST(doc_id AS VARCHAR)
                           || '@example.com now'
                      WHEN doc_id % 3 = 1 THEN ' call 555-0199 today'
                      ELSE ' host 10.0.0.7 up' END AS text
  FROM documents"""


def oracle_sql() -> dict[str, str]:
    return {
        "o1_reading_order": """
SELECT user_id, event_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY value * 3000 + event_id, event_id) AS INT)
         AS read_rank
FROM events
""",
        "o5_interval_union": """
WITH t AS (
  SELECT o_custkey, CAST(epoch(o_orderdate) AS BIGINT) AS lo,
         CAST(epoch(o_orderdate) AS BIGINT) + 2592000 AS hi
  FROM orders
),
f AS (
  SELECT *, CASE WHEN max(hi) OVER w IS NULL OR lo > max(hi) OVER w
                 THEN 1 ELSE 0 END AS new_island
  FROM t
  WINDOW w AS (PARTITION BY o_custkey ORDER BY lo, hi
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
i AS (
  SELECT *, SUM(new_island) OVER (PARTITION BY o_custkey ORDER BY lo, hi
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS island
  FROM f
)
SELECT o_custkey, CAST(island AS BIGINT) AS island,
       MIN(lo) AS span_start, MAX(hi) AS span_end,
       COUNT(*) AS n_merged
FROM i GROUP BY o_custkey, island
""",
        "j1_first_wins": """
WITH spans AS (
  SELECT l_orderkey AS okey, l_linenumber AS span_line,
         l_quantity AS s_lo, l_quantity + 10 AS s_hi
  FROM lineitem
),
blocks AS (
  SELECT l_orderkey AS okey, l_linenumber AS block_line,
         l_quantity - 5 AS b_lo, l_quantity + 20 AS b_hi
  FROM lineitem WHERE l_linenumber <= 2
),
j AS (
  SELECT s.okey, s.span_line, b.block_line
  FROM spans s JOIN blocks b USING (okey)
  WHERE (LEAST(s.s_hi, b.b_hi) - GREATEST(s.s_lo, b.b_lo)) / 10.0 > 0.6
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY okey, span_line ORDER BY block_line) AS rn
  FROM j
)
SELECT okey, span_line, block_line FROM r WHERE rn = 1
""",
        "f2_lang_detect": """
SELECT doc_id,
       CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh' ELSE 'en' END
         AS lang_detected
FROM documents
""",
        "f3_md_escape": r"""
SELECT doc_id,
       replace(replace(replace(replace(substr(text, 1, 64),
         '*', '\*'), '`', '\`'), '~', '\~'), '$', '\$') AS escaped
FROM documents
""",
        "p5_boilerplate_emit": """
WITH p AS (
  SELECT event_id,
         CASE WHEN event_type = 'click' THEN chr(10) || '# ' || props || chr(10)
              WHEN event_type = 'purchase' THEN chr(10) || props || chr(10)
              WHEN event_type IN ('view', 'signup') THEN ' ' || props || ' '
              ELSE NULL END AS piece
  FROM events
)
SELECT event_id, piece FROM p WHERE piece IS NOT NULL
""",
        "p2_a1_conf_envelope": """
SELECT l_orderkey,
       MIN(l_extendedprice) AS x0, MIN(l_quantity) AS y0,
       MAX(l_extendedprice) AS x1, MAX(l_quantity) AS y1,
       COUNT(*) AS n_spans
FROM lineitem WHERE l_discount >= 0.05
GROUP BY l_orderkey
""",
        "f9_page_id": """
SELECT event_id,
       printf('%s_page_%04d', event_type, CAST(event_id % 500 AS INT)) AS page_id
FROM events
""",
        "p6_geometry_normalize": """
SELECT l_orderkey, l_linenumber,
       LEAST(l_extendedprice, l_extendedprice * l_tax) AS x0,
       LEAST(l_quantity, l_quantity * (1 + l_discount)) AS y0,
       GREATEST(l_extendedprice, l_extendedprice * l_tax) AS x1,
       GREATEST(l_quantity, l_quantity * (1 + l_discount)) AS y1
FROM lineitem
""",
        "f6_f7_trunc_round": """
SELECT l_orderkey, l_linenumber,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS xi,
       ROUND(l_discount, 2) AS score2
FROM lineitem
""",
        "extract_min_slice": min_slice_sql(),
        "asof_join": relops.asof_join_sql(),
        "sessionize": relops.sessionize_sql(),
        "session_window_agg": relops.session_window_agg_sql(),
        "blocklist_filter": f"""
WITH c AS ({urlops.canonical_url_sql("documents", urlops.url_sql_expr()).strip()})
SELECT doc_id, host FROM c
WHERE host NOT IN ('example1.com', 'example4.com')
""",
        "dedup_exact": """
SELECT md5(substr(text, 1, 64)) AS key, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
FROM documents GROUP BY 1
""",
        "minhash_signature": _MINHASH + "SELECT doc_id, seed, minhash FROM sig",
        "lsh_candidate_pairs": _MINHASH
        + """,
b AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(minhash, '|' ORDER BY minhash)) AS bucket
  FROM sig GROUP BY doc_id, seed // 2
)
SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
FROM b a JOIN b b2 USING (band, bucket)
WHERE a.doc_id < b2.doc_id
""",
        "simhash": _simhash_sql(),
        "simhash_neardup": f"""
WITH sig AS ({_simhash_sql().strip()}),
bands AS (
  SELECT doc_id, simhash, CAST(band AS INT) AS band,
         (simhash >> (CAST(band AS INT) * 4)) & 15 AS key
  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bb
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         a.simhash AS sa, b2.simhash AS sb
  FROM bands a JOIN bands b2 USING (band, key)
  WHERE a.doc_id < b2.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
""",
        # whole corpus, stop-shingle df guard mirrors textops.ngram_jaccard_pairs
        "ngram_jaccard": "WITH "
        + _SHINGLES.strip()
        + """,
dfq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfq USING (shingle)
        WHERE df <= 64),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM shf a JOIN shf b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.02
""",
        "lang_id_ngram": """
SELECT doc_id,
       CAST(length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS INT) AS n_cjk,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS INT) AS n_latin,
       CASE WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) * 2
                 > length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
            THEN 'cjk' ELSE 'latin' END AS script
FROM documents
""",
        "quality_score": """
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars_calc,
       CAST(len(string_split(text, ' ')) AS INT) AS n_words,
       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INT)
         AS n_punct,
       CAST(len(list_filter(string_split(text, ' '),
                w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS INT) AS n_stop,
       ROUND(len(list_filter(string_split(text, ' '),
                w -> w IN ('the', 'a', 'of', 'and', 'to')))
             / len(string_split(text, ' ')), 6) AS stop_ratio
FROM documents
""",
        "token_count": r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INT) AS n_bpe_tokens
FROM documents
""",
        # thresholds mirror textops.gopher_quality defaults; the pass flag
        # compares the UNROUNDED ratios (identical IEEE division of exact
        # ints on both engines)
        "gopher_quality": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_words,
       ROUND(length(replace(text, ' ', ''))
             / len(string_split(text, ' ')), 6) AS mean_word_len,
       CAST(len(list_filter(string_split(text, ' '),
                w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS INT) AS n_stop_hits,
       ROUND((length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) / 3)
             / len(string_split(text, ' ')), 6) AS symbol_ratio,
       (len(string_split(text, ' ')) BETWEEN 25 AND 100000
        AND length(replace(text, ' ', '')) / len(string_split(text, ' '))
            BETWEEN 3.0 AND 10.0
        AND len(list_filter(string_split(text, ' '),
                w -> w IN ('the', 'a', 'of', 'and', 'to'))) >= 2
        AND (length(text) - length(replace(text, '#', ''))
             + (length(text) - length(replace(text, '...', ''))) / 3)
            / len(string_split(text, ' ')) < 0.1) AS gopher_pass
FROM documents
""",
        "repetition_stats": """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
wc AS (
  SELECT doc_id, word, count(*) AS c FROM w WHERE word <> ''
  GROUP BY doc_id, word
),
wstat AS (
  SELECT doc_id, max(c) AS top_word_n, sum(c) AS n_words,
         count(*) AS n_distinct FROM wc GROUP BY doc_id
),
arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(len(a) - 1),
                               i -> a[i + 1] || ' ' || a[i + 2])) AS gram
  FROM arr WHERE len(a) >= 2
),
gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
gstat AS (
  SELECT doc_id, max(c) AS top_2gram_n, sum(c) AS n_2grams
  FROM gc GROUP BY doc_id
)
SELECT w.doc_id, CAST(w.n_words AS INT) AS n_words,
       ROUND(w.top_word_n / w.n_words, 6) AS top_word_frac,
       ROUND(1 - w.n_distinct / w.n_words, 6) AS dup_word_frac,
       ROUND(g.top_2gram_n / g.n_2grams, 6) AS top_2gram_frac
FROM wstat w LEFT JOIN gstat g USING (doc_id)
""",
        # patterns are the Java-regex ∩ RE2 common subset (textops.PII_*);
        # counts on raw text, replace order email → ip → phone
        "pii_scrub": "\nWITH inj AS (\n  " + _PII_INJ_CTE + "\n)" + r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text,
       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(text, '\b\d{3}[- ]\d{4}\b')) AS INT) AS n_phones,
  CAST(len(regexp_extract_all(text,
       '\b\d{1,3}(\.\d{1,3}){3}\b')) AS INT) AS n_ips,
  regexp_replace(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
      '\b\d{3}[- ]\d{4}\b', '<PHONE>', 'g') AS scrubbed
FROM inj
""",
        "winnow_fingerprints": _winnow_sql(3, 4),
        "winnow_fingerprints_k4": _winnow_sql(4, 5),
        "substring_dup_spans": _substring_dup_sql(5),
        "html_main_content": htmlops.html_main_content_sql(
            "documents", htmlops.html_sql_expr()
        ),
        "html_block_stats": htmlops.html_block_stats_sql(
            "documents", htmlops.html_sql_expr()
        ),
        # DOM variant == relational variant on well-formed pages (agreement
        # pinned in tests/test_htmlops.py), so it shares the twin
        "html_dom_extract": htmlops.html_main_content_sql(
            "documents", htmlops.html_sql_expr()
        ),
        "html_extract_turns": htmlops.extract_html_turns_sql(),
        "hll_words": sketches.hll_registers_sql(
            "(SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))"
            " AS word FROM documents) tw",
            "word",
        ),
        "bpe_merges": bpe.bpe_train_sql(),
        "bpe_vocab": bpe.bpe_vocab_sql(),
        "cms_words": sketches.cms_registers_sql(
            "(SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))"
            " AS word FROM documents) tw",
            "word",
        ),
        "hash_sample_docs": (
            "SELECT doc_id, n_chars FROM documents WHERE "
            + sketches.hash_sample_pred_sql("doc_id", 0.10)
        ),
        "segment_dedup": textops.segment_dedup_sql(),
        "mixture_sample": textops.mixture_sample_sql(),
        "pack_sequences": textops.pack_sequences_sql(),
        "dsir_select": textops.dsir_select_sql(),
        "dsir_select_threshold": textops.dsir_select_threshold_sql(-20),
        "leakage_safe_split": textops.leakage_safe_split_sql(),
        "bm25_topk": textops.bm25_topk_sql(),
        "kcenter_select": simsearch.kcenter_select_sql(),
        "bigram_lm_score": textops.bigram_lm_score_sql(),
        "tfidf_topk": textops.tfidf_topk_sql(),
        "quality_classifier": textops.quality_classifier_sql(),
        "chunk_documents": textops.chunk_documents_sql(),
        "vocab_stats": textops.vocab_stats_sql(),
        "length_quantiles": textops.length_quantiles_sql(),
        "url_canonicalize": urlops.canonical_url_sql(
            "documents", urlops.url_sql_expr()
        ),
        "url_dedup": urlops.url_dedup_sql("documents", urlops.url_sql_expr()),
        "url_domain_stats": urlops.domain_stats_sql(
            "documents", urlops.url_sql_expr()
        ),
        # weights are 31^i mod 982451653; wv and each product are reduced
        # mod the same prime so nothing exceeds int64 (matches
        # textops.fingerprint — values unchanged vs the non-overflowing form)
        "doc_fingerprint": """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
f AS (
  SELECT doc_id,
         CAST(ascii(substr(word || '__', 1, 1)) * 65536
              + ascii(substr(word || '__', 2, 1)) * 256
              + length(word) AS BIGINT) % 982451653 AS wv,
         CAST([1,31,961,29791,923521,28629151,887503681,3967827][(pos % 8) + 1]
              AS BIGINT) AS weight
  FROM w WHERE word <> ''
)
SELECT doc_id, CAST(SUM((wv * weight) % 982451653) % 982451653 AS BIGINT)
         AS fingerprint
FROM f GROUP BY doc_id
""",
        "baseline_ann_cosine_topk": """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
p AS (
  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
         CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
                                      i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot
  FROM q a JOIN q b ON a.vec_id % 10 = 0 AND b.vec_id <> a.vec_id
),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY dot DESC, n_id) AS INT) AS rank
  FROM p
)
SELECT q_id, n_id, dot, rank FROM r WHERE rank <= 10
""",
        "ann_ivf_topk": simsearch.ivf_topk_sql(),
        "neardup_clusters": _NEARDUP_CLUSTERS,
        "ann_ivf_train": simsearch.ivf_train_sql(),
        "dedup_representatives": f"""
WITH clusters AS ({_NEARDUP_CLUSTERS.strip()})
SELECT doc_id, n_members FROM (
  SELECT cluster AS doc_id, COUNT(*) AS n_members
  FROM clusters GROUP BY cluster
)
""",
        "ann_ivf_topk_trained": simsearch.ivf_topk_trained_sql(),
        "rrf_fuse_ann": simsearch.rrf_fuse_sql(
            simsearch.ivf_topk_sql(), simsearch.ivf_topk_trained_sql()
        ),
        "ann_ivf_topk_nprobe": simsearch.ivf_topk_trained_sql(nprobe=3),
        "cosine_neardup_ivf": simsearch.cosine_neardup_ivf_sql(),
        "semdedup": simsearch.semdedup_sql(),
        "training_corpus_v2": simsearch.training_corpus_v2_sql(
            source_cte=_PII_INJ_CTE
        ),
        "training_corpus_v3": simsearch.training_corpus_v3_sql(
            source_cte=_PII_INJ_CTE
        ),
        "training_corpus_v4": simsearch.training_corpus_v4_sql(
            source_cte=_PII_INJ_CTE
        ),
        "training_corpus_v5": simsearch.training_corpus_v5_sql(
            source_cte=_PII_INJ_CTE
        ),
        "decontaminate": """
WITH c0 AS (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents WHERE doc_id % 50 <> 0),
csh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, GREATEST(len(ws) - 1, 1)),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
           AS shingle
  FROM c0 WHERE len(ws) >= 3
),
b0 AS (SELECT doc_id, string_split(text, ' ') AS ws
       FROM documents WHERE doc_id % 50 = 0),
bsh AS (
  SELECT DISTINCT
         unnest(list_transform(range(1, GREATEST(len(ws) - 1, 1)),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
           AS shingle
  FROM b0 WHERE len(ws) >= 3
),
hits AS (
  SELECT doc_id, COUNT(*) AS n_shared_shingles
  FROM csh JOIN bsh USING (shingle) GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(h.n_shared_shingles, 0) AS n_shared_shingles,
       COALESCE(h.n_shared_shingles, 0) = 0 AS clean
FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
LEFT JOIN hits h USING (doc_id)
""",
        "dedup_against": """
WITH rk AS (
  SELECT DISTINCT md5(substr(text, 1, 64)) AS key
  FROM documents WHERE doc_id % 4 = 0
)
SELECT d.doc_id, md5(substr(d.text, 1, 64)) AS key
FROM documents d
WHERE d.doc_id % 4 <> 0
  -- NOT EXISTS, not NOT IN: Spark's left_anti is null-unsafe (a NULL
  -- key never matches, the row SURVIVES); NOT IN over a set containing
  -- NULL evaluates to NULL and would drop every row
  AND NOT EXISTS (SELECT 1 FROM rk
                  WHERE rk.key = md5(substr(d.text, 1, 64)))
""",
        "neardup_against": f"""
WITH {_band_cte("c", "doc_id % 4 <> 0")},
{_band_cte("r", "doc_id % 4 = 0")},
hits AS (
  SELECT DISTINCT c.doc_id AS doc_id, r.doc_id AS ref_id
  FROM cband c JOIN rband r USING (band, bucket)
)
SELECT doc_id, COUNT(*) AS n_ref_candidates FROM hits GROUP BY doc_id
""",
        # the FULL pipeline twin: both engines (staged + fused) must equal
        # the same SQL — and each other — byte-for-byte on main_text
        "extract_pipeline": _extract_sql(),
        "extract_fused": _extract_sql(),
        "pipeline_dedup_extract": rf"""
WITH extracted AS ({min_slice_sql()}),
clusters AS ({_NEARDUP_CLUSTERS.strip()}),
reps AS (SELECT cluster AS doc_id, COUNT(*) AS n_members
         FROM clusters GROUP BY cluster),
q AS (
  SELECT e.doc_id, r.n_members,
         CAST(len(list_filter(string_split(e.mini_md, ' '), w -> w <> ''))
              AS INT) AS n_words,
         CAST(len(regexp_extract_all(e.mini_md, '\w+|[^\w\s]')) AS INT)
           AS n_bpe_tokens,
         md5(e.mini_md) AS text_hash
  FROM extracted e JOIN reps r USING (doc_id)
)
SELECT doc_id, n_members, n_words, n_bpe_tokens, text_hash
FROM q WHERE n_words >= 40
""",
        "cosine_neardup_lsh": _MINHASH
        + """,
b AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(minhash, '|' ORDER BY minhash)) AS bucket
  FROM sig GROUP BY doc_id, seed // 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM b a JOIN b b2 USING (band, bucket)
  WHERE a.doc_id < b2.doc_id
),
q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v,
         CAST(list_sum(list_transform(range(1, len(v) + 1),
                                      i -> v[i] * v[i])) AS BIGINT) AS n2
  FROM q
),
p AS (
  SELECT c.doc_a AS a_id, c.doc_b AS b_id,
         CAST(list_sum(list_transform(range(1, len(na.v) + 1),
                                      i -> na.v[i] * nb.v[i])) AS BIGINT) AS dot,
         na.n2 AS an, nb.n2 AS bn
  FROM cand c
  JOIN n na ON na.vec_id = c.doc_a
  JOIN n nb ON nb.vec_id = c.doc_b
)
SELECT a_id, b_id, dot FROM p
WHERE dot > 0
  AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) * 1000000.0
      > 2500.0 * CAST(an AS DOUBLE) * CAST(bn AS DOUBLE)
""",
        "baseline_cosine_neardup_blocked": """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v,
         CAST(list_sum(list_transform(range(1, len(v) + 1),
                                      i -> v[i] * v[i])) AS BIGINT) AS n2
  FROM q
),
p AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(list_sum(list_transform(range(1, len(a.v) + 1),
                                      i -> a.v[i] * b.v[i])) AS BIGINT) AS dot,
         a.n2 AS an, b.n2 AS bn
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT a_id, b_id, dot FROM p
WHERE dot > 0
  AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) * 1000000.0
      > 122500.0 * CAST(an AS DOUBLE) * CAST(bn AS DOUBLE)
""",
        # full deterministic detection stage incl. recursive-CTE greedy NMS
        "task_layout_detection": tasks.layout_detection_sql(),
        "task_layout_detection_v2": tasks.layout_detection_lmv3_sql(),
        "task_formula_detection": tasks.formula_detection_sql(),
        "task_visualization": viz.visualize_svg_sql(),
        "task_ocr_crop_assign": tasks.ocr_crop_assign_sql(),
        "task_table_parsing": tasks.table_parsing_sql(),
        # FULL M9 OCR merge layer: bubble pass as a list-state recursive
        # CTE, line merge + mask split relationally (tasks.ocr_spans_sql)
        "task_ocr_spans": tasks.ocr_spans_sql(),
        # F1 fixpoint as a recursive CTE (RE2 lookahead emulated via
        # sentinel-protected `\ ` pairs — see mfr.f1_fixpoint_cte)
        "task_formula_recognition": _formula_recognition_sql(),
        "baseline_cosine_neardup": """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v,
         CAST(list_sum(list_transform(range(1, len(v) + 1),
                                      i -> v[i] * v[i])) AS BIGINT) AS n2
  FROM q
),
p AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(list_sum(list_transform(range(1, len(a.v) + 1),
                                      i -> a.v[i] * b.v[i])) AS BIGINT) AS dot,
         a.n2 AS an, b.n2 AS bn
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT a_id, b_id, dot FROM p
WHERE dot > 0
  AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) * 1000000.0
      > 122500.0 * CAST(an AS DOUBLE) * CAST(bn AS DOUBLE)
""",
    }
