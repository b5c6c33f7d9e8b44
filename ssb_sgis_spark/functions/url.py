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
