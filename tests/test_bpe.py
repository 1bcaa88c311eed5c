"""BPE training: classic merge behavior pinned on a handcrafted corpus,
greedy-leftmost replace semantics, tie-break determinism, and segment
application. Driver parity (vs the unrolled DuckDB twin) is covered by
test_queries_duckdb.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkextract import bpe  # noqa: E402


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_learns_frequent_pair_first(spark):
    # 'ab' appears in every word; must be merge 0
    df = _docs(spark, ["abab abc", "abd abab"])
    m = {r.merge_idx: (r.lsym, r.rsym, r.merged) for r in bpe.bpe_train(df, 2).collect()}
    assert m[0] == ("a", "b", "ab")
    # merge 1 operates on the post-merge symbols: 'ab ab' is now the
    # dominant adjacent pair inside 'abab'
    assert m[1] == ("ab", "ab", "abab")


def test_bpe_greedy_leftmost_on_runs(spark):
    # 'aaa': after learning ('a','a'), a run of 3 segments as aa + a
    df = _docs(spark, ["aaa aaa aa"])
    merges = [(r.lsym, r.rsym) for r in bpe.bpe_train(df, 1).collect()]
    assert merges == [("a", "a")]
    seg = bpe.bpe_segment(df, merges).collect()
    counts = {r.word: r.n_symbols for r in seg}
    assert counts["aaa"] == 2  # aa + a (leftmost-greedy, non-overlapping)
    assert counts["aa"] == 1


def test_bpe_tiebreak_deterministic(spark):
    # 'xy' and 'yz' both occur once (word 'xyz'); lexicographic pair
    # order breaks the tie -> 'x y' < 'y z'
    df = _docs(spark, ["xyz"])
    m = bpe.bpe_train(df, 1).collect()
    assert (m[0].lsym, m[0].rsym) == ("x", "y")


def test_bpe_merge_counts_weighted_by_frequency(spark):
    # 'qq' occurs in 3 word instances but 1 distinct word; 'rs' in 2
    # distinct words. Training runs on the word-frequency table, so
    # freq-weighting counts occurrences, not distinct words.
    df = _docs(spark, ["qq qq qq", "rs sr rs"])
    m = bpe.bpe_train(df, 1).collect()[0]
    assert (m.lsym, m.rsym) == ("q", "q") and m.pair_count == 3


def test_bpe_segment_reduces_symbols(spark):
    df = _docs(spark, ["hello hello help", "hello helper"])
    merges = [(r.lsym, r.rsym) for r in bpe.bpe_train(df, 6).collect()]
    seg = bpe.bpe_segment(df, merges).collect()
    base = {r.word: len(r.word) for r in seg}
    for r in seg:
        assert 1 <= r.n_symbols <= base[r.word]
    # the most frequent word must compress strictly
    hello = next(r for r in seg if r.word == "hello")
    assert hello.n_symbols < 5


def test_bpe_exhausted_corpus_stops_early(spark):
    # single one-char word: no pairs at all -> zero merges, no crash
    df = _docs(spark, ["a a a"])
    assert bpe.bpe_train(df, 4).count() == 0


def test_bpe_vocab_compression(spark):
    df = _docs(spark, ["hello hello hello world", "hello worldly"])
    vocab = {r.word: (r.freq, r.n_symbols) for r in bpe.bpe_vocab(df, 6).collect()}
    assert vocab["hello"][0] == 4
    # the dominant word compresses strictly below its char count
    assert vocab["hello"][1] < 5
    for w, (_, n) in vocab.items():
        assert 1 <= n <= len(w)
