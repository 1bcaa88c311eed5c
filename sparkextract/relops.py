"""Relational phrasings of the SURVEY §2 operators over generic tables
(FIXTURES.md §5) — each has a DuckDB oracle twin in __spark_entry__.py.

All pure Catalyst: these are the operators whose reference semantics are
sequential Python loops but whose *relational form* is a window /
gaps-and-islands / theta-join pattern (SURVEY.md §2.3-2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def reading_order(events: DataFrame) -> DataFrame:
    """O1/O8: composite-key ordering window (pdf2markdown.py:262-266 shape:
    key = y*3000 + x with a deterministic tiebreak)."""
    key = F.col("value") * F.lit(3000.0) + F.col("event_id")
    w = Window.partitionBy("user_id").orderBy(key.asc(), F.col("event_id").asc())
    return events.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("read_rank"),
    )


def interval_union(orders: DataFrame, span_days: int = 30) -> DataFrame:
    """O5 gaps-and-islands interval union (paddle_ocr.py:108-122 shape):
    merge overlapping [orderdate, orderdate+span_days] ranges per customer."""
    day = 86400
    t = orders.select(
        "o_custkey",
        F.unix_timestamp("o_orderdate").alias("lo"),
        (F.unix_timestamp("o_orderdate") + F.lit(span_days * day)).alias("hi"),
    )
    w = Window.partitionBy("o_custkey").orderBy("lo", "hi")
    prev_max = F.max("hi").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = t.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("lo") > prev_max), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return islands.groupBy("o_custkey", "island").agg(
        F.min("lo").alias("span_start"),
        F.max("hi").alias("span_end"),
        F.count(F.lit(1)).alias("n_merged"),
    )


def first_wins_fill(lineitem: DataFrame) -> DataFrame:
    """J1 (merge_blocks_and_spans.py:111-155 shape): spans join the earliest
    qualifying block via theta predicate + first-wins window. Spans = all
    lineitems of an order (interval [qty, qty+10]); blocks = its first two
    lineitems (interval [qty-5, qty+20]); overlap/span_len > 0.6."""
    spans = lineitem.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("span_line"),
        F.col("l_quantity").alias("s_lo"),
        (F.col("l_quantity") + 10).alias("s_hi"),
    )
    blocks = lineitem.filter(F.col("l_linenumber") <= 2).select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("block_line"),
        (F.col("l_quantity") - 5).alias("b_lo"),
        (F.col("l_quantity") + 20).alias("b_hi"),
    )
    ov = F.least("s_hi", "b_hi") - F.greatest("s_lo", "b_lo")
    joined = spans.join(blocks, "okey").where(ov / F.lit(10.0) > F.lit(0.6))
    w = Window.partitionBy("okey", "span_line").orderBy("block_line")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("okey", "span_line", "block_line")
    )


def lang_detect(documents: DataFrame) -> DataFrame:
    """F2 (merge_blocks_and_spans.py:195-205): zh iff any CJK char."""
    return documents.select(
        "doc_id",
        F.when(F.col("text").rlike("[一-鿿]"), F.lit("zh"))
        .otherwise(F.lit("en"))
        .alias("lang_detected"),
    )


def md_escape_prefix(documents: DataFrame, n: int = 64) -> DataFrame:
    """F3 (merge_blocks_and_spans.py:207-215): escape * ` ~ $ in order."""
    s = F.substring("text", 1, n)
    for ch in ("*", "`", "~", "$"):
        s = F.replace(s, F.lit(ch), F.lit("\\" + ch))
    return documents.select("doc_id", s.alias("escaped"))


def boilerplate_emit(events: DataFrame) -> DataFrame:
    """P5 (pdf2markdown.py:313-323 shape): category-conditional render,
    non-emitting categories stripped."""
    piece = (
        F.when(F.col("event_type") == "click", F.concat(F.lit("\n# "), F.col("props"), F.lit("\n")))
        .when(F.col("event_type") == "purchase", F.concat(F.lit("\n"), F.col("props"), F.lit("\n")))
        .when(F.col("event_type").isin("view", "signup"), F.concat(F.lit(" "), F.col("props"), F.lit(" ")))
        .otherwise(F.lit(None))
    )
    return events.select("event_id", piece.alias("piece")).where(
        F.col("piece").isNotNull()
    )


def page_id_format(events: DataFrame) -> DataFrame:
    """F9 (base_task.py:65,75): '%s_page_%04d' id formatting."""
    return events.select(
        "event_id",
        F.format_string(
            "%s_page_%04d", F.col("event_type"), (F.col("event_id") % 500).cast("int")
        ).alias("page_id"),
    )


def geometry_normalize(lineitem: DataFrame) -> DataFrame:
    """P6 (paddle_ocr.py:94-105 / merge_blocks_and_spans.py:118-124):
    poly corner pairs → normalized bbox via least/greatest."""
    ax, bx = F.col("l_extendedprice"), F.col("l_extendedprice") * F.col("l_tax")
    ay, by = F.col("l_quantity"), F.col("l_quantity") * (1 + F.col("l_discount"))
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.least(ax, bx).alias("x0"),
        F.least(ay, by).alias("y0"),
        F.greatest(ax, bx).alias("x1"),
        F.greatest(ay, by).alias("y1"),
    )


def trunc_round(lineitem: DataFrame) -> DataFrame:
    """F7 int-truncation (pdf2markdown.py:89) + F6 round-2
    (pdf2markdown.py:93) over generic numerics (non-negative → floor)."""
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice")).cast("bigint").alias("xi"),
        F.round(F.col("l_discount"), 2).alias("score2"),
    )


def conf_envelope(lineitem: DataFrame) -> DataFrame:
    """P2 threshold filter + A1 envelope aggregation
    (merge_blocks_and_spans.py:58-64 shape)."""
    return (
        lineitem.where(F.col("l_discount") >= 0.05)
        .groupBy("l_orderkey")
        .agg(
            F.min("l_extendedprice").alias("x0"),
            F.min("l_quantity").alias("y0"),
            F.max("l_extendedprice").alias("x1"),
            F.max("l_quantity").alias("y1"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )
