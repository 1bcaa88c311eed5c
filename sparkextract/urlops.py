"""URL canonicalization + crawl-style dedup over a documents corpus.

Web-scale training pipelines dedup fetches by CANONICAL URL before any
content hashing (the same page is crawled as ``http://www.X.com:80/a/``,
``http://x.com/a?utm_source=f`` …). The rule set here is the common
public subset (RFC 3986 §6 syntax-based normalization + the standard
tracking-param strip):

* scheme and host lowercased; leading ``www.`` dropped (ALL repetitions
  — ``www.www.a`` → ``a`` — so canonicalization is idempotent)
* default port stripped (``:80`` for http, ``:443`` for https; repeated
  suffixes stripped wholesale for the same idempotency contract)
* trailing ``/`` stripped from the path; empty path → ``/``
* query: ``utm_*`` params dropped, the rest sorted and re-joined
* fragment dropped

Everything is Catalyst string/array expressions in the Java ∩ RE2 regex
subset (DESIGN.md §5), so the DuckDB twins hash-match. All three
operators have the plan you want at 100 TB: ``canonical_url`` is
map-only (fuses into the scan); ``url_dedup`` and ``domain_stats`` are
one shuffle each on a small key with map-side combine.

The driver testdata has no URL column, so (like the PII injection)
``documents_as_urls`` synthesizes one deterministic URL per doc with
five surface variants per canonical form — case noise, www, explicit
:80, trailing slash, utm params, fragment, param order — making every
normalization rule load-bearing in the driver rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*"
AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
QUERY_RE = r"\?([^#]*)"


def _canon_cols(url: F.Column):
    """(scheme, host, path, query) canonical pieces for a url Column."""
    scheme = F.lower(F.regexp_extract(url, SCHEME_RE, 0))
    auth = F.lower(F.regexp_extract(url, AUTHORITY_RE, 1))
    host = F.regexp_replace(auth, r"^(www\.)+", "")
    host = F.when(scheme == "http", F.regexp_replace(host, "(:80)+$", "")).when(
        scheme == "https", F.regexp_replace(host, "(:443)+$", "")
    ).otherwise(host)
    rawpath = F.regexp_extract(url, PATH_RE, 1)
    path = F.regexp_replace(rawpath, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.split(F.regexp_extract(url, QUERY_RE, 1), "&")
    query = F.array_join(
        F.array_sort(
            F.filter(q, lambda p: (p != "") & ~p.startswith("utm_"))
        ),
        "&",
    )
    return scheme, host, path, query


def canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """doc_id, url, canonical_url, host. Map-only — zero shuffle."""
    scheme, host, path, query = _canon_cols(F.col(url_col))
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    # no scheme → not a URL we normalize; pass through untouched
    canon = F.when(F.col(url_col).rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), canon).otherwise(
        F.col(url_col)
    )
    host_out = F.when(
        F.col(url_col).rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), host
    ).otherwise(F.lit(""))
    return df.select(
        "doc_id", F.col(url_col).alias("url"),
        canon.alias("canonical_url"), host_out.alias("host"),
    )


def url_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawl dedup: one row per canonical URL with the fetch count and
    the keeper (min doc_id) — same contract as textops.exact_dedup but
    keyed on the canonical URL. One combinable shuffle."""
    return (
        canonical_url(df, url_col)
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper"))
    )


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host crawl accounting: fetches, distinct canonical pages.
    count_distinct runs as Spark's standard two-phase partial-agg plan;
    the host key space is tiny so the final shuffle is negligible."""
    return (
        canonical_url(df, url_col)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("canonical_url").alias("n_pages"),
        )
    )


# ------------------------------------------------------------ SQL twins
def _canon_sql(url: str) -> dict[str, str]:
    scheme = f"lower(regexp_extract({url}, '{SCHEME_RE}', 0))"
    auth = f"lower(regexp_extract({url}, '{AUTHORITY_RE}', 1))"
    host0 = f"regexp_replace({auth}, '^(www\\.)+', '')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host0}, '(:80)+$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host0}, '(:443)+$', '') "
        f"ELSE {host0} END"
    )
    path0 = f"regexp_replace(regexp_extract({url}, '{PATH_RE}', 1), '/+$', '')"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    # DuckDB regexp_extract is NULL on no match (Spark: '') — coalesce
    # the whole chain so a query-less URL canonicalizes, not NULLs out
    query = (
        "coalesce(array_to_string(list_sort(list_filter(string_split("
        f"regexp_extract({url}, '{QUERY_RE}', 1), '&'), "
        "p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&'), '')"
    )
    return {"scheme": scheme, "host": host, "path": path, "query": query}


def canonical_url_sql(source_sql: str, url_expr: str) -> str:
    """DuckDB twin of ``canonical_url`` (url_expr names/derives the url)."""
    c = _canon_sql("url")
    return f"""
WITH uraw AS (SELECT doc_id, {url_expr} AS url FROM {source_sql}),
ucan AS (
  SELECT doc_id, url,
         CASE WHEN regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://')
              THEN {c['scheme']} || '://' || {c['host']} || {c['path']} ||
                   CASE WHEN {c['query']} = '' THEN ''
                        ELSE '?' || {c['query']} END
              ELSE url END AS canonical_url,
         CASE WHEN regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://')
              THEN {c['host']} ELSE '' END AS host
  FROM uraw
)
SELECT doc_id, url, canonical_url, host FROM ucan
"""


def url_dedup_sql(source_sql: str, url_expr: str) -> str:
    return f"""
WITH c AS ({canonical_url_sql(source_sql, url_expr).strip()})
SELECT canonical_url, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
FROM c GROUP BY canonical_url
"""


def domain_stats_sql(source_sql: str, url_expr: str) -> str:
    return f"""
WITH c AS ({canonical_url_sql(source_sql, url_expr).strip()})
SELECT host, COUNT(*) AS n_docs,
       COUNT(DISTINCT canonical_url) AS n_pages
FROM c GROUP BY host
"""


# -------------------------------------------------------- URL synthesis
# canonical form for every variant of a doc:
#   http://example{doc_id%7}.com/docs/{doc_id%40}?id={doc_id%40}
# variant v = doc_id%5 adds surface noise that canonicalization must
# remove: 0 = already canonical, 1 = case + WWW + :80 + trailing slash,
# 2 = utm_ param prepended (order exercise), 3 = utm_ appended +
# fragment, 4 = trailing slash only.
def url_col(doc_id: str = "doc_id") -> F.Column:
    d = F.col(doc_id)
    h = (d % 7).cast("string")
    k = (d % 40).cast("string")
    # variant from d div 40, NOT d: docs that share a canonical URL
    # (d ≡ d' mod 280) then carry DIFFERENT surface forms, so the
    # normalization rules are what collapses them — not raw equality.
    # (d - d%40)/40 is exact in doubles; cast pins the integer.
    v = ((d - d % 40) / 40).cast("bigint") % 5
    scheme = F.when(v == 1, F.lit("HTTP://WWW.Example")).otherwise(
        F.lit("http://example")
    )
    dom = F.when(v == 1, F.lit(".COM:80")).otherwise(F.lit(".com"))
    slash = F.when((v == 1) | (v == 4), F.lit("/")).otherwise(F.lit(""))
    query = (
        F.when(v == 2, F.concat(F.lit("?utm_source=feed&id="), k))
        .when(v == 3, F.concat(F.lit("?id="), k, F.lit("&utm_campaign=x")))
        .otherwise(F.concat(F.lit("?id="), k))
    )
    frag = F.when(v == 3, F.lit("#frag")).otherwise(F.lit(""))
    return F.concat(scheme, h, dom, F.lit("/docs/"), k, slash, query, frag)


def url_sql_expr(doc_id: str = "doc_id") -> str:
    h = f"CAST({doc_id} % 7 AS VARCHAR)"
    k = f"CAST({doc_id} % 40 AS VARCHAR)"
    v = f"(CAST(({doc_id} - {doc_id} % 40) / 40 AS BIGINT) % 5)"
    return f"""(
      CASE WHEN {v} = 1 THEN 'HTTP://WWW.Example' ELSE 'http://example' END
      || {h}
      || CASE WHEN {v} = 1 THEN '.COM:80' ELSE '.com' END
      || '/docs/' || {k}
      || CASE WHEN {v} = 1 OR {v} = 4 THEN '/' ELSE '' END
      || CASE WHEN {v} = 2 THEN '?utm_source=feed&id=' || {k}
              WHEN {v} = 3 THEN '?id=' || {k} || '&utm_campaign=x'
              ELSE '?id=' || {k} END
      || CASE WHEN {v} = 3 THEN '#frag' ELSE '' END
    )"""


def documents_as_urls(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, url) with the deterministic synthetic URL."""
    return documents.select("doc_id", url_col().alias("url"))
