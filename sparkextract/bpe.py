"""Distributed BPE tokenizer training (Sennrich+16) over the corpus.

The standard scale trick: train on the WORD-FREQUENCY table, not the
corpus — at 100 TB the distinct-word table is orders of magnitude
smaller than the text, and every BPE statistic is a weighted sum over
it. Each round is one Spark job:

    pair counts  = explode adjacent symbol pairs per word × freq
                   (map-side combinable groupBy on the pair key)
    best pair    = global top-1 (count DESC, pair ASC — deterministic
                   tie-break), one driver-side row per round (the same
                   bounded-driver-loop shape as simsearch.ivf_train)
    apply merge  = CANONICAL leftmost-greedy non-overlapping merge of
                   the pair in every word's symbol list, as a pure
                   ``aggregate`` fold over the array (lookbehind form:
                   merged = lsym+rsym never equals lsym, so a run like
                   'a a a a' merges to 'aa aa' exactly like reference
                   BPE — pinned by test)

The DuckDB twin unrolls ``n_merges`` rounds; the apply step is a
per-word recursive CTE walking the symbol list (the same list-state
pattern as the NMS / bubble-pass twins, DESIGN.md §5.2), all under one
``WITH RECURSIVE`` prefix. Output = the merge table (merge_idx, lsym,
rsym, merged, pair_count), which IS the trained tokenizer."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symbolized(documents: DataFrame) -> DataFrame:
    """word, freq, sy — corpus word-frequency table with the char-level
    symbol list."""
    from .textops import words

    wf = words(documents).groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    return wf.select(
        "word", "freq",
        F.regexp_extract_all(F.col("word"), F.lit("."), F.lit(0)).alias("sy"),
    )


def _pair_counts(v: DataFrame) -> DataFrame:
    pairs = v.select(
        "freq",
        F.explode(
            F.when(
                F.size("sy") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("sy") - 2),
                    lambda i: F.concat_ws(" ", F.col("sy")[i], F.col("sy")[i + 1]),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(F.sum("freq").alias("cnt"))


def _merge_fold(sy: F.Column, lsym: str, rsym: str) -> F.Column:
    """Leftmost-greedy merge of (lsym, rsym) in a symbol list — the
    canonical single-round BPE application. Lookbehind fold: merge when
    the accumulated tail is lsym and the current symbol is rsym; since
    merged != lsym (rsym is non-empty) a fresh merge can never chain
    into the next one, which is exactly the non-overlapping rule."""
    merged = lsym + rsym

    def step(acc: F.Column, x: F.Column) -> F.Column:
        can = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lsym))
            & (x == F.lit(rsym))
        )
        return F.when(
            can,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(sy, F.array().cast("array<string>"), step)


def bpe_train(documents: DataFrame, n_merges: int = 8) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns the merge table
    (merge_idx, lsym, rsym, merged, pair_count) — deterministic,
    engine-portable, and exactly what a tokenizer needs to run."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = documents.sparkSession
    v = _symbolized(documents)
    merges = []
    for i in range(n_merges):
        best = (
            _pair_counts(v)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], best[0]["cnt"]
        lsym, rsym = pair.split(" ")
        merges.append((i, lsym, rsym, lsym + rsym, int(cnt)))
        v = v.select(
            "word", "freq", _merge_fold(F.col("sy"), lsym, rsym).alias("sy")
        ).localCheckpoint()  # truncate the n_merges-deep fold lineage
    return spark.createDataFrame(
        merges,
        "merge_idx int, lsym string, rsym string, merged string, pair_count bigint",
    )


def bpe_segment(documents: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a trained merge list to the corpus words: doc tokenization
    with the learned vocabulary. Map-only (the chained folds fuse into
    one projection). Output: doc_id, word, n_symbols."""
    from .textops import words

    sy = F.regexp_extract_all(F.col("word"), F.lit("."), F.lit(0))
    for lsym, rsym in merges:
        sy = _merge_fold(sy, lsym, rsym)
    return words(documents).select(
        "doc_id", "word", F.size(sy).cast("int").alias("n_symbols")
    )


def _bpe_train_parts(n_merges: int) -> tuple[list[str], list[str]]:
    """The structural pieces of the training twin: (ctes, merge_selects).
    ``bpe_train_sql`` joins them as-is; ``bpe_vocab_sql`` reuses the CTE
    chain with its own final projection — STRUCTURAL composition, not
    substring splicing (ADVICE r03: the old literal-substring search
    broke on n_merges=0 and on any format change to the tail)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    ctes = [
        """v0 AS MATERIALIZED (
  SELECT word, COUNT(*) AS freq, regexp_extract_all(word, '.', 0) AS sy
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        FROM documents) tw
  GROUP BY word
)"""
    ]
    for i in range(n_merges):
        p = i + 1
        ctes.append(f"""p{p} AS MATERIALIZED (
  SELECT u.pair, CAST(SUM(u.freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(list_transform(range(1, len(sy)),
             j -> sy[j] || ' ' || sy[j + 1])) AS pair
    FROM v{i}
  ) u GROUP BY u.pair
)""")
        ctes.append(f"""b{p} AS MATERIALIZED (
  SELECT pair, cnt,
         string_split(pair, ' ')[1] AS lsym,
         string_split(pair, ' ')[2] AS rsym,
         replace(pair, ' ', '') AS merged
  FROM p{p} ORDER BY cnt DESC, pair ASC LIMIT 1
)""")
        # canonical leftmost-greedy merge as a per-word recursive walk
        ctes.append(f"""r{p} AS (
  SELECT v.word, v.freq, v.sy, 1 AS i, [v.sy[1]] AS out
  FROM v{i} v
  UNION ALL
  SELECT r.word, r.freq, r.sy, r.i + 1,
         CASE WHEN r.out[len(r.out)] = b.lsym AND r.sy[r.i + 1] = b.rsym
              THEN list_append(list_slice(r.out, 1, len(r.out) - 1), b.merged)
              ELSE list_append(r.out, r.sy[r.i + 1]) END
  FROM r{p} r CROSS JOIN b{p} b
  WHERE r.i < len(r.sy)
)""")
        ctes.append(f"""v{p} AS MATERIALIZED (
  SELECT word, freq, out AS sy FROM r{p} WHERE i = len(sy)
)""")
    selects = [
        f"""SELECT {i} AS merge_idx, lsym, rsym, merged, cnt AS pair_count
FROM b{i + 1}"""
        for i in range(n_merges)
    ]
    return ctes, selects


def bpe_train_sql(n_merges: int = 8) -> str:
    """DuckDB twin: rounds unrolled; each apply step is a per-word
    recursive walk over the symbol list (list-state recursive CTE)."""
    ctes, selects = _bpe_train_parts(n_merges)
    return "WITH RECURSIVE " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def bpe_vocab(documents: DataFrame, n_merges: int = 8) -> DataFrame:
    """The segmented vocabulary AFTER training: word, freq, n_symbols —
    i.e. what the learned tokenizer does to every corpus word (the
    compression the merges actually bought). Runs the same bounded
    training loop and returns the final symbol table instead of the
    merge list."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    v = _symbolized(documents)
    for _ in range(n_merges):
        best = (
            _pair_counts(v)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        lsym, rsym = best[0]["pair"].split(" ")
        v = v.select(
            "word", "freq", _merge_fold(F.col("sy"), lsym, rsym).alias("sy")
        ).localCheckpoint()
    return v.select(
        "word", F.col("freq").cast("bigint").alias("freq"),
        F.size("sy").cast("int").alias("n_symbols"),
    )


def bpe_vocab_sql(n_merges: int = 8) -> str:
    """DuckDB twin: the train twin's CTE chain with the final v{n}
    vocabulary CTE projected instead of the merge-table UNION."""
    ctes, _ = _bpe_train_parts(n_merges)
    return (
        "WITH RECURSIVE " + ",\n".join(ctes) + "\n"
        f"SELECT word, CAST(freq AS BIGINT) AS freq, "
        f"CAST(len(sy) AS INT) AS n_symbols FROM v{n_merges}"
    )
