"""URL canonicalization for web-corpus dedup.

Crawl-derived corpora dedup first on the *canonical URL* (cf. the CCNet /
RefinedWeb pipelines: normalize, then exact-dedup by URL before any
content hashing). Canonicalization must be a pure deterministic function
— at 100 TB it runs as a map-only column expression feeding the exact-
dedup shuffle, so everything here is built-in string/array functions
(regexp capture + list filter/sort), zero Python.

Normalization rules (the common subset of the URL-normalization RFCs and
crawler practice):

- scheme and host lowercased;
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment stripped;
- tracking params (``utm_*``) removed; surviving query params sorted
  byte-wise (order-insensitive canonical form);
- trailing ``/`` stripped from non-root paths; empty path -> ``/``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scheme :// host[:port] path query(no ?) — fragment handled separately.
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?"


def canonical_url(col: Column | str) -> Column:
    """Canonical form of a URL column per the module rules. Malformed
    input (no ``scheme://``) is returned trimmed-lowercase as-is."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _URL_RE, 2))
    path = F.regexp_extract(u, _URL_RE, 3)
    query = F.regexp_extract(u, _URL_RE, 4)

    host = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).otherwise(
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", "")).otherwise(
            hostport
        )
    )

    path_norm = F.when(path == "", F.lit("/")).otherwise(
        F.when(path != "/", F.regexp_replace(path, "/$", "")).otherwise(path)
    )

    params = F.filter(
        F.when(query == "", F.array().cast("array<string>")).otherwise(
            F.split(query, "&")
        ),
        lambda p: ~p.startswith("utm_"),
    )
    query_norm = F.array_join(F.array_sort(params), "&")

    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path_norm,
        F.when(query_norm == "", F.lit("")).otherwise(F.concat(F.lit("?"), query_norm)),
    )
    return F.when(scheme == "", F.lower(u)).otherwise(rebuilt)


def canonical_url_sql(val: str) -> str:
    """DuckDB twin of :func:`canonical_url`, generated beside the operator
    so the two cannot drift. ``val`` is a SQL expression yielding the URL."""
    u = f"trim({val})"
    re = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?"
    scheme = f"lower(regexp_extract({u}, '{re}', 1))"
    hostport = f"lower(regexp_extract({u}, '{re}', 2))"
    path = f"regexp_extract({u}, '{re}', 3)"
    query = f"regexp_extract({u}, '{re}', 4)"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    path_norm = (
        f"CASE WHEN {path} = '' THEN '/' "
        f"WHEN {path} <> '/' THEN regexp_replace({path}, '/$', '') "
        f"ELSE {path} END"
    )
    params = (
        f"list_filter(CASE WHEN {query} = '' THEN CAST([] AS VARCHAR[]) "
        f"ELSE string_split({query}, '&') END, p -> NOT starts_with(p, 'utm_'))"
    )
    query_norm = f"array_to_string(list_sort({params}), '&')"
    rebuilt = (
        f"{scheme} || '://' || ({host}) || ({path_norm}) || "
        f"(CASE WHEN {query_norm} = '' THEN '' ELSE '?' || {query_norm} END)"
    )
    return f"CASE WHEN {scheme} = '' THEN lower({u}) ELSE {rebuilt} END"
