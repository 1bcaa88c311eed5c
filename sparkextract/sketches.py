"""Distributed sketches over the corpus: HyperLogLog registers,
count-min frequency counters, and deterministic hash sampling.

Both are built on the engine-portability rule every cross-engine hash
in this repo follows (DESIGN.md §5): decisions read md5 HEX CHARACTERS
(string order == numeric order for fixed-length lowercase hex), never
engine-parsed integers — so the DuckDB twins are byte-equal.

* ``hll_registers`` — the HLL sketch state (Flajolet+07): bucket = first
  2 hex chars (256 registers), rho = 1 + number of leading zero BITS in
  the next 64 bits, computed exactly from hex chars (leading-'0' count ×4
  + a nibble CASE — no bit parsing). The register table is pure integers
  and map-side combinable: one tiny shuffle on the 256-key bucket, the
  canonical mergeable-sketch shape (registers from disjoint partitions /
  days / shards merge by elementwise MAX — that is the whole point of
  HLL at 100 TB).
* ``hll_estimate`` — the scalar estimate from a collected register
  table, computed driver-side in a FIXED fold order (the harmonic-mean
  sum is floating point; summing in bucket order keeps it deterministic;
  256 doubles is not a distributed problem).
* ``hash_sample`` — deterministic corpus subsampling: keep a row iff the
  first 4 hex chars of md5(salt:key) are lexicographically below the
  rate threshold. Same sample at any parallelism, any engine, any run —
  the property ad-hoc ``rand()`` sampling lacks; map-only plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"
# leading zero bits of a nibble given its hex char
_NIBBLE_LZ = {**{"1": 3, "2": 2, "3": 2}, **{c: 1 for c in "4567"},
              **{c: 0 for c in "89abcdef"}}


def _rho_col() -> F.Column:
    """1 + leading-zero-bit count of the 64 bits in hex chars 3..18 of a
    column named ``h`` (the md5 hex digest)."""
    stripped = F.expr("trim(LEADING '0' FROM substring(h, 3, 16))")
    zchars = 16 - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    nib_lz = F.lit(0)
    for c, lz in _NIBBLE_LZ.items():
        nib_lz = F.when(first == c, F.lit(lz)).otherwise(nib_lz)
    return (
        F.when(F.length(stripped) == 0, F.lit(65))  # all 64 bits zero
        .otherwise(zchars * 4 + nib_lz + 1)
        .cast("int")
    )


def hll_registers(df: DataFrame, key: F.Column | str) -> DataFrame:
    """(bucket, max_rho): the 256-register HLL state for COUNT DISTINCT
    of ``key``. Integers only; merge two sketches with elementwise MAX."""
    keyed = df.select(F.md5(key if isinstance(key, F.Column) else F.col(key)).alias("h"))
    ix1 = F.instr(F.lit(HEX), F.substring("h", 1, 1)) - 1
    ix2 = F.instr(F.lit(HEX), F.substring("h", 2, 1)) - 1
    # h is a materialized column: _rho_col reads it by name
    d = keyed.select(
        ((ix1 * 16 + ix2).cast("int")).alias("bucket"), _rho_col().alias("rho")
    )
    return d.groupBy("bucket").agg(F.max("rho").alias("max_rho"))


def hll_registers_sql(source_sql: str, key_expr: str) -> str:
    """DuckDB twin of ``hll_registers``."""
    cases = " ".join(f"WHEN '{c}' THEN {lz}" for c, lz in _NIBBLE_LZ.items())
    return f"""
WITH hh AS (SELECT md5({key_expr}) AS h FROM {source_sql}),
hr AS (
  SELECT CAST((strpos('{HEX}', substr(h, 1, 1)) - 1) * 16
              + (strpos('{HEX}', substr(h, 2, 1)) - 1) AS INT) AS bucket,
         CAST(CASE WHEN length(trim(LEADING '0' FROM substr(h, 3, 16))) = 0
              THEN 65
              ELSE (16 - length(trim(LEADING '0' FROM substr(h, 3, 16)))) * 4
                   + (CASE substr(trim(LEADING '0' FROM substr(h, 3, 16)), 1, 1)
                      {cases} ELSE 0 END) + 1
              END AS INT) AS rho
  FROM hh
)
SELECT bucket, MAX(rho) AS max_rho FROM hr GROUP BY bucket
"""


def hll_estimate(registers: list[tuple[int, int]], m: int = 256) -> float:
    """Scalar HLL estimate from (bucket, max_rho) rows — driver-side,
    fixed fold order (sorted by bucket) so the double sum is
    deterministic. Standard Flajolet+07 with the small-range linear
    counting correction; 256 registers → ~6.5% standard error."""
    import math

    regs = [0] * m
    for b, r in registers:
        regs[b] = r
    alpha = 0.7213 / (1 + 1.079 / m)
    s = 0.0
    for r in regs:  # fixed order
        s += 2.0 ** (-r)
    est = alpha * m * m / s
    zeros = regs.count(0)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


def hash_sample(
    df: DataFrame, key: F.Column | str, rate: float, salt: str = "s1"
) -> DataFrame:
    """Deterministic sampling: keep iff the first 4 hex chars of
    md5(salt:key) sort below the rate threshold. Reproducible across
    runs/partitionings/engines; map-only (fuses into the scan)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    if rate >= 1.0:
        # format(65536) is 5 hex chars — lexicographic compare against a
        # 4-char prefix would silently drop rows; rate 1.0 means ALL
        return df
    thresh = format(int(rate * 65536), "04x")
    k = key if isinstance(key, F.Column) else F.col(key)
    pref = F.substring(F.md5(F.concat(F.lit(salt + ":"), k.cast("string"))), 1, 4)
    return df.where(pref < F.lit(thresh))


def hash_sample_pred_sql(key_expr: str, rate: float, salt: str = "s1") -> str:
    """The sampling predicate as DuckDB SQL (compose into any WHERE)."""
    if rate >= 1.0:
        return "TRUE"  # see hash_sample: the 5-hex threshold edge
    thresh = format(int(rate * 65536), "04x")
    return (
        f"substr(md5('{salt}:' || CAST({key_expr} AS VARCHAR)), 1, 4) < '{thresh}'"
    )


# ------------------------------------------------------------ count-min
CMS_DEPTH = 4      # hash rows (md5 seeded 0..3)
CMS_WIDTH = 1024   # buckets per row: first e hex chars... 1024 = 16^2*4


def cms_registers(df: DataFrame, key: F.Column | str) -> DataFrame:
    """Count-min sketch state (Cormode-Muthukrishnan'05) for item
    frequencies of ``key``: depth 4 × width 1024 counters.

    Row r's bucket = first 2.5 hex chars of md5(r:key) — exactly
    10 bits read as hex-char positions (two full chars ×4 bits + the
    high 2 bits of the third), integer arithmetic only. Counters are
    SUM-mergeable across shards/days (the sketch property that matters
    at 100 TB); one combinable shuffle on the tiny (row, bucket) key
    space (4×1024). Estimate = min over rows of the counter — see
    ``cms_estimate``; always an over-count, never under."""
    k = key if isinstance(key, F.Column) else F.col(key)
    rows = []
    for r in range(CMS_DEPTH):
        h = F.md5(F.concat(F.lit(f"{r}:"), k))
        ix = lambda i: F.instr(F.lit(HEX), F.substring(h, i, 1)) - 1  # noqa: E731
        bucket = (ix(1) * 64 + ix(2) * 4 + (ix(3) - ix(3) % 4) / 4).cast("int")
        rows.append(
            df.select(F.lit(r).alias("row"), bucket.alias("bucket"))
        )
    u = rows[0]
    for d in rows[1:]:
        u = u.unionByName(d)
    return u.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("n"))


def cms_registers_sql(source_sql: str, key_expr: str) -> str:
    """DuckDB twin of ``cms_registers``."""
    parts = []
    for r in range(CMS_DEPTH):
        h = f"md5('{r}:' || {key_expr})"
        ix = lambda i: f"(strpos('{HEX}', substr({h}, {i}, 1)) - 1)"  # noqa: E731
        parts.append(
            f"SELECT {r} AS row, CAST({ix(1)} * 64 + {ix(2)} * 4 + "
            f"CAST(({ix(3)} - {ix(3)} % 4) / 4 AS INT) AS INT) AS bucket "
            f"FROM {source_sql}"
        )
    body = " UNION ALL ".join(parts)
    return f"""
WITH cms AS ({body})
SELECT row, bucket, COUNT(*) AS n FROM cms GROUP BY row, bucket
"""


def cms_estimate(registers: list[tuple[int, int, int]], key_value: str) -> int:
    """Point frequency estimate for one item from collected (row,
    bucket, n) rows: min over depth rows of that item's counter."""
    import hashlib

    table = {(r, b): n for r, b, n in registers}
    est = None
    for r in range(CMS_DEPTH):
        h = hashlib.md5(f"{r}:{key_value}".encode()).hexdigest()
        ixs = [HEX.index(c) for c in h[:3]]
        bucket = ixs[0] * 64 + ixs[1] * 4 + (ixs[2] - ixs[2] % 4) // 4
        n = table.get((r, bucket), 0)
        est = n if est is None else min(est, n)
    return int(est or 0)
