"""URL extraction / normalization / domain rollups (pure Catalyst).

Web-corpus pipelines (CCNet, C4, Dolma, RefinedWeb) filter and dedup at the
URL and registrable-domain level before any content pass: domain allow/deny
lists, per-domain caps, URL-seen-before dedup across crawls. These are
string-expression problems, so everything here is JVM-side regexp/split
expressions — zero Python, zero shuffle until the caller aggregates.

Every regex is RE2-safe (no lookarounds/backrefs) and used VERBATIM by the
DuckDB oracle, so extraction and normalization are engine-portable
byte-for-byte.

Registrable-domain note: a faithful implementation consults the Public
Suffix List; that dataset isn't shipped here, so `registrable_domain` uses
the standard approximation — last two host labels, or three when the
two-label suffix is a well-known multi-part TLD (co.uk family). The operator
shape (project → groupBy domain) is unchanged by swapping in a full PSL
lookup table as a broadcast join.

Scope limits (deliberate, consistent on both engines): URL_RE matches
scheme + host + optional path only — explicit ports (`host:8080/...`) and
userinfo (`u:p@host`) truncate at the host (rare in web corpora; a port-
aware pattern drops in without changing any plan), and internationalized
hostnames must already be punycoded (raw unicode hosts don't match).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# host must END on an alphanumeric: prose like 'see https://example.com.'
# would otherwise capture host 'example.com.' and roll up under domain 'com.'
URL_RE = r"https?://[A-Za-z0-9.-]*[A-Za-z0-9](?:/[^\s]*)?"
_HOST_RE = r"https?://([A-Za-z0-9.-]*[A-Za-z0-9])"
# tracking params dropped by normalize_url; the trailing &/? tidy-up runs after
_TRACKING_RE = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*&?"
MULTI_PART_TLDS = ("co.uk", "com.au", "co.jp", "co.in", "com.br")


def extract_urls(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, url) — every http(s) URL occurrence per document (not distinct:
    occurrence counts matter for per-domain caps)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)).alias("url"),
    )


def url_host(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def normalize_url(url: Column) -> Column:
    """Canonical form for URL-level dedup: lowercase scheme+host, strip the
    fragment, strip tracking params, tidy dangling '?'/'&', strip one
    trailing slash. Identical regexp sequence in the oracle."""
    host = url_host(url)
    path = F.regexp_extract(url, r"https?://[A-Za-z0-9.-]*[A-Za-z0-9](/[^\s]*)?", 1)
    u = F.concat(F.lit("https://"), host, path)
    u = F.regexp_replace(u, r"#[^\s]*", "")
    u = F.regexp_replace(u, _TRACKING_RE, "")
    u = F.regexp_replace(u, r"[?&]$", "")
    return F.regexp_replace(u, r"/$", "")


def registrable_domain(host: Column) -> Column:
    """Last-two-labels approximation, three for known multi-part TLDs."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    two = F.array_join(F.slice(parts, n - 1, 2), ".")
    three = F.array_join(F.slice(parts, n - 2, 3), ".")
    is_multi = two.isin(*MULTI_PART_TLDS)
    return F.when(n <= 2, host).when(is_multi & (n >= 3), three).otherwise(two)


def domain_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-registrable-domain rollup: URL occurrences, distinct documents,
    distinct normalized URLs — the relation domain caps and deny-list
    filters consume. One explosion, one groupBy(domain)."""
    urls = extract_urls(df, id_col, text_col)
    enriched = urls.select(
        "id",
        "url",
        registrable_domain(url_host(F.col("url"))).alias("domain"),
        normalize_url(F.col("url")).alias("norm_url"),
    )
    return enriched.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("id").alias("n_docs"),
        F.countDistinct("norm_url").alias("n_distinct_urls"),
    )
