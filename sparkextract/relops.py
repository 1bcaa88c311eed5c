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


def asof_join(events: DataFrame, update_type: str = "signup") -> DataFrame:
    """As-of join — the operator Spark famously lacks: attach to every
    event the MOST RECENT at-or-before dimension row for its key. Here
    the dimension is the per-user stream of ``update_type`` events (an
    SCD-style profile feed derived from the same table, so the query is
    self-contained on the driver corpus).

    Scale shape (the union+window phrasing, NOT a range join): tag both
    sides, union, ONE shuffle on user_id (verified by plan test), then a
    running last-non-null over (ts, side, event_id). Cost is one exchange +
    sort regardless of how many events each update covers — the naive
    theta join is O(events x updates) per key. Ties are deterministic:
    at equal ts the update sorts first (inclusive as-of), then event_id.

    Output: event_id, user_id, ts_us (epoch micros; ts is NTZ and the
    session tz is pinned UTC in session.py, so the cast is exact),
    has_match, asof_value (0.0 when no prior update — NULL-free output
    hashes portably at the driver; has_match disambiguates). Oracle:
    DuckDB's NATIVE ``ASOF LEFT JOIN`` — a genuinely independent
    implementation of the same semantics."""
    # No per-(user, ts) pre-dedup pass: the running last-non-null below
    # already picks the LATEST update at any ts (same-ts updates sort by
    # event_id, and last() takes the final one), so the whole join is
    # genuinely ONE exchange — hashpartitioning(user_id) for the window.
    upd = events.where(F.col("event_type") == update_type).select(
        "user_id", "ts", F.lit(0).alias("side"),
        F.col("event_id"), F.col("value").alias("uval"),
    )
    ev = events.select(
        "user_id", "ts", F.lit(1).alias("side"), F.col("event_id"),
        F.lit(None).cast("double").alias("uval"),
    )
    u = upd.unionByName(ev)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("av", F.last("uval", ignorenulls=True).over(w))
        .where(F.col("side") == 1)
        .select(
            "event_id", "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.col("av").isNotNull().alias("has_match"),
            F.coalesce("av", F.lit(0.0)).alias("asof_value"),
        )
    )


def asof_join_sql(update_type: str = "signup") -> str:
    """DuckDB twin using the native ASOF JOIN (independent of the
    union+window phrasing — if either side mis-handles ties or
    inclusivity, the hash breaks)."""
    return f"""
WITH upd AS (
  SELECT user_id, ts, value AS uval,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = '{update_type}'
),
upd1 AS (SELECT user_id, ts, uval FROM upd WHERE rn = 1)
SELECT e.event_id, e.user_id,
       CAST(epoch_us(e.ts) AS BIGINT) AS ts_us,
       u.uval IS NOT NULL AS has_match,
       coalesce(u.uval, 0.0) AS asof_value
FROM events e ASOF LEFT JOIN upd1 u
  ON e.user_id = u.user_id AND e.ts >= u.ts
"""


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Event-time sessionization (the web-analytics classic): a new
    session starts when the gap to the previous event of the same user
    exceeds ``gap_minutes``. Gaps-and-islands: lag + running SUM of
    session starts — one exchange on user_id.

    Output: event_id, user_id, session_id (1-based per user),
    event_seq (1-based position within the session)."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
    new_sess = F.when(
        prev.isNull() | (F.unix_micros(F.col("ts").cast("timestamp")) - prev > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    d = events.select(
        "event_id", "user_id", "ts", new_sess.alias("new_sess")
    ).withColumn(
        "session_id",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    return d.select(
        "event_id", "user_id", "session_id",
        F.row_number().over(ws).cast("int").alias("event_seq"),
    )


def sessionize_sql(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH d AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
           AS session_id
  FROM d
)
SELECT event_id, user_id, session_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                               ORDER BY ts, event_id) AS INT) AS event_seq
FROM s
"""


def session_window_agg(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session rollup via Spark's NATIVE ``session_window`` (the
    Structured-Streaming-ready form of ``sessionize``): events with
    gaps < gap merge into one window; window_end = last_ts + gap.

    Oracle: the independent gaps-and-islands derivation (group
    ``sessionize``'s islands, min/max + gap). Boundary semantics pinned
    by test: an event at EXACTLY start+gap still merges (strict > opens
    a session) — the twin uses the same strict rule.
    Output: user_id, start_us, end_us, n_events (epoch micros)."""
    g = f"{gap_minutes} minutes"
    tts = F.col("ts").cast("timestamp")
    return (
        events.groupBy(F.session_window(tts, g).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("start_us"),
            F.unix_micros(F.col("sw.end")).alias("end_us"),
            "n_events",
        )
    )


def session_window_agg_sql(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH d AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM d
)
SELECT user_id, MIN(tus) AS start_us, MAX(tus) + {gap_us} AS end_us,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def blocklist_filter(urls: DataFrame, blocked_hosts: DataFrame) -> DataFrame:
    """Crawl deny-list: drop rows whose canonical host appears in the
    block table. LEFT ANTI join with the (tiny) list broadcast — at
    100 TB the corpus side never shuffles; the deny list rides to every
    executor. Output: doc_id, host (survivors only)."""
    from pyspark.sql.functions import broadcast

    from .urlops import canonical_url

    c = canonical_url(urls)
    return c.join(broadcast(blocked_hosts), "host", "left_anti").select(
        "doc_id", "host"
    )
