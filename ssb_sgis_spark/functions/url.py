"""URL/domain column functions for Common-Crawl-style page tables.

Domain-level statistics and URL canonicalization are the first stages of
every web-corpus pipeline (domain blocklists, per-domain caps, recrawl
dedup).  Everything here is a NATIVE column expression (codegen, no
Python), and every function has a ``*_sql`` twin producing the exact
same arithmetic in ANSI/DuckDB SQL so results are oracle-checkable
bit-for-bit.  The regexes are deliberately shared verbatim between the
Spark and SQL forms instead of using ``F.parse_url`` — identical
operator trees on both sides is what makes the hash compare meaningful.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one regex, used verbatim on both sides
_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"


def host_col(url: Column) -> Column:
    """Hostname (scheme-authority parse; empty string for non-URLs)."""
    return F.regexp_extract(url, _HOST_RE, 1)


def host_sql(u: str = "url") -> str:
    return f"regexp_extract({u}, '{_HOST_RE}', 1)"


def domain_col(url: Column) -> Column:
    """Registered domain approximation: last two dot-labels of the host
    (``a.b.site7.no`` → ``site7.no``).  A public-suffix list is data,
    not code — join one against this column when you have it."""
    h = host_col(url)
    parts = F.split(h, "\\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(h)


def domain_sql(u: str = "url") -> str:
    h = host_sql(u)
    return (
        f"CASE WHEN len(string_split({h}, '.')) >= 2 THEN "
        f"string_split({h}, '.')[-2] || '.' || string_split({h}, '.')[-1] "
        f"ELSE {h} END"
    )


def tld_col(url: Column) -> Column:
    return F.element_at(F.split(host_col(url), "\\."), -1)


def tld_sql(u: str = "url") -> str:
    return f"string_split({host_sql(u)}, '.')[-1]"


def path_col(url: Column) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def path_sql(u: str = "url") -> str:
    return f"regexp_extract({u}, '{_PATH_RE}', 1)"


def path_depth_col(url: Column) -> Column:
    """Number of non-empty path segments (``/p/42/`` → 2)."""
    segs = F.split(path_col(url), "/")
    return F.size(F.filter(segs, lambda s: s != F.lit("")))


def path_depth_sql(u: str = "url") -> str:
    return (
        f"len(list_filter(string_split({path_sql(u)}, '/'), s -> s <> ''))"
    )


def canonical_url_col(url: Column) -> Column:
    """Dedup key: lowercase host + path without query/fragment or a
    trailing slash.  Recrawl snapshots of one page collapse to one key."""
    p = F.regexp_replace(path_col(url), "/+$", "")
    return F.concat(F.lower(host_col(url)), p)


def canonical_url_sql(u: str = "url") -> str:
    return f"lower({host_sql(u)}) || regexp_replace({path_sql(u)}, '/+$', '')"


# path INCLUDING the query string (SURT keys keep ?query, drop #fragment)
_PATHQ_RE = "^[a-z][a-z0-9+.-]*://[^/?#]+([^#]*)"


def surt_col(url: Column) -> Column:
    """SURT-form sort key (Sort-friendly URI Reordering Transform), the
    ordering Common Crawl's CDX indexes use: lowercase the host, drop a
    leading ``www.``, reverse the dot-labels comma-joined, then ``)`` +
    path+query.  ``https://www.a.site7.no/p/42?q=1`` →
    ``no,site7,a)/p/42?q=1``.  Reversing the host puts every subdomain
    of a domain in one contiguous key range — prefix scans and range
    pruning replace full-index scans."""
    h = F.regexp_replace(F.lower(host_col(url)), "^www\\.", "")
    rev = F.array_join(F.reverse(F.split(h, "\\.")), ",")
    return F.concat(rev, F.lit(")"), F.regexp_extract(url, _PATHQ_RE, 1))


def surt_sql(u: str = "url") -> str:
    h = f"regexp_replace(lower({host_sql(u)}), '^www\\.', '')"
    return (
        f"array_to_string(list_reverse(string_split({h}, '.')), ',')"
        f" || ')' || regexp_extract({u}, '{_PATHQ_RE}', 1)"
    )


# --- RFC 3986 URL normalization (the crawl dedup-key normal form) -----
#
# Spark side: the REAL algorithm — scheme/host lowercasing, default-port
# strip, fragment strip, duplicate-slash collapse, dot-segment
# resolution as a higher-order STACK FOLD (aggregate over path
# segments: '..' pops, '.' drops, else push — whole-stage codegen, no
# Python), tracking-param removal + query-param sort.  The SQL twin
# mirrors every step except the fold, which DuckDB's element-typed
# list_reduce cannot express — there it is a bounded '/x/../' replace
# chain (exact for nesting depth <= 6; the oracle law stays within it),
# so the two engines compute the same answer by INDEPENDENT algorithms.
#
# Deliberate normal-form choices (documented contract): trailing
# slashes collapse ('/a/b/' == '/a/b', matching canonical_url_col's
# dedup stance), an empty path is '/', an empty query disappears.

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_ANYHOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_ANY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
TRACKING_PARAMS_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def normalize_url_col(url: Column) -> Column:
    """RFC 3986 normal form of an absolute URL (native exprs only)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _ANYHOST_RE, 1))
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, ":80$", ""),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, ":443$", ""),
    ).otherwise(host)
    raw_path = F.regexp_extract(url, _PATH_ANY_RE, 1)
    segs = F.filter(
        F.split(raw_path, "/"), lambda s: (s != "") & (s != ".")
    )
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            s == "..", F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0)))
        ).otherwise(F.concat(acc, F.array(s))),
    )
    path = F.concat(F.lit("/"), F.array_join(stack, "/"))
    q = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAMS_RE),
        )
    )
    qnorm = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )


def normalize_url_sql(u: str = "url") -> str:
    """DuckDB twin — same normal form via a bounded dot-segment replace
    chain (exact to nesting depth 6) instead of the HOF fold."""
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    host0 = f"lower(regexp_extract({u}, '{_ANYHOST_RE}', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host0}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host0}, ':443$', '') "
        f"ELSE {host0} END"
    )
    # sentinel slash: with every segment slash-TERMINATED, the leftmost
    # '/seg/../' replacement provably equals stack semantics (a '..'
    # can only consume the segment directly before it, and leading
    # '..'s cannot reach a later segment)
    p = f"regexp_replace(regexp_extract({u}, '{_PATH_ANY_RE}', 1), '/+', '/', 'g') || '/'"
    for _ in range(3):  # '/./' matches overlap through shared slashes
        p = f"regexp_replace({p}, '/\\./', '/', 'g')"
    for _ in range(6):  # one '/seg/../' level per pass
        p = f"regexp_replace({p}, '/[^/]+/\\.\\./', '/')"
    p = f"regexp_replace({p}, '^(/\\.\\.)+/', '/')"
    p = f"regexp_replace({p}, '/+$', '')"
    p = f"CASE WHEN {p} = '' THEN '/' ELSE {p} END"
    # DuckDB regexp_extract yields NULL on no-match (Spark yields '');
    # an unmatched query must not NULL the whole concat
    q = f"coalesce(regexp_extract({u}, '{_QUERY_RE}', 1), '')"
    params = (
        f"list_sort(list_filter(string_split({q}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAMS_RE}')))"
    )
    # array_to_string([]) is NULL in DuckDB, not ''
    qn = f"coalesce(array_to_string({params}, '&'), '')"
    return (
        f"{scheme} || '://' || {host} || {p} || "
        f"CASE WHEN {qn} = '' THEN '' ELSE '?' || {qn} END"
    )
