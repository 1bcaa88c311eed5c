"""Similarity search over an embedding column (array<float>).

Brute-force top-k as the correctness baseline; LSH/bucketed variants as
the scale path (the bucket join in textops.lsh_candidate_pairs is the
same pattern). Cross-engine determinism: embeddings are quantized to
integer milli-units first, so dot products are exact integer sums —
no FP-summation-order ambiguity between Spark and the DuckDB oracle.

All arithmetic stays JVM-side (zip_with/aggregate higher-order
functions — no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quantized(embeddings: DataFrame) -> DataFrame:
    # cast float→double BEFORE scaling: float*int arithmetic differs across
    # engines; double math on the exact float value is bit-identical
    q = F.transform("embedding", lambda x: F.round(x.cast("double") * 1000).cast("bigint"))
    return embeddings.select("vec_id", q.alias("q"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )


def ann_topk(
    embeddings: DataFrame, k: int = 10, query_mod: int = 10
) -> DataFrame:
    """Brute-force max-inner-product top-k: every vec_id % query_mod == 0
    is a query. The query side is tiny → broadcast it so the big side
    never shuffles (the 100 TB plan: one broadcast + narrow scan)."""
    base = quantized(embeddings)
    queries = base.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("q").alias("qv")
    )
    pairs = base.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id",
        F.col("vec_id").alias("n_id"),
        _dot(F.col("qv"), F.col("q")).alias("dot"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "dot", "rank")
    )


def ivf_topk(
    embeddings: DataFrame, k: int = 5, query_mod: int = 10, n_cells: int = 8
) -> DataFrame:
    """IVF-bucketed ANN (the scale path): deterministic centroids = the
    first ``n_cells`` vectors (vec_id < n_cells); every vector is assigned
    to its max-dot-product cell; queries search ONLY their own cell. The
    probe join is (cell, cell)-keyed — candidate count ∝ n/n_cells per
    query instead of n. Approximate by construction; exactness comes from
    the DuckDB twin computing the identical quantized arithmetic."""
    base = quantized(embeddings)
    cents = base.where(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("q").alias("cv")
    )
    scored = base.join(F.broadcast(cents), F.lit(True)).select(
        "vec_id", "q", "cell", _dot(F.col("q"), F.col("cv")).alias("cdot")
    )
    wc = Window.partitionBy("vec_id").orderBy(F.col("cdot").desc(), F.col("cell").asc())
    assigned = (
        scored.withColumn("rn", F.row_number().over(wc))
        .where("rn = 1")
        .select("vec_id", "q", "cell")
    )
    queries = assigned.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("q").alias("qv"), "cell"
    )
    pairs = assigned.join(F.broadcast(queries), "cell").where(
        F.col("vec_id") != F.col("q_id")
    )
    scored2 = pairs.select(
        "q_id", F.col("vec_id").alias("n_id"), _dot(F.col("qv"), F.col("q")).alias("dot")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("n_id").asc())
    return (
        scored2.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "dot", "rank")
    )


def cosine_neardup(embeddings: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-dup pairs: cos(a,b) > t via the integer-exact
    inequality dot² · 10⁶ > t²·10⁶ · |a|²·|b|² (no sqrt, no FP division).
    Brute force on pairs; at scale, feed LSH candidates instead."""
    base = quantized(embeddings)
    norms = base.select(
        "vec_id", F.col("q").alias("v"), _dot(F.col("q"), F.col("q")).alias("n2")
    )
    a = norms.select(
        F.col("vec_id").alias("a_id"), F.col("v").alias("av"), F.col("n2").alias("an")
    )
    b = norms.select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("bv"), F.col("n2").alias("bn")
    )
    t2 = int(round(threshold * threshold * 1_000_000))
    pairs = a.join(b, F.col("a_id") < F.col("b_id"))
    # the squared compare runs in doubles over exact integer inputs —
    # bit-identical across engines, and immune to bigint overflow
    d = F.col("dot").cast("double")
    return (
        pairs.withColumn("dot", _dot(F.col("av"), F.col("bv")))
        .where(
            (F.col("dot") > 0)
            & (
                d * d * F.lit(1_000_000.0)
                > F.lit(float(t2)) * F.col("an").cast("double") * F.col("bn").cast("double")
            )
        )
        .select("a_id", "b_id", "dot")
    )
