"""URL kernels: canonicalization, hashing, host extraction.

Reference semantics:
  * X1 canonicalize — Page#to_absolute (/root/reference/lib/polipus/page.rb:171-195):
    strip trailing ``#[a-zA-Z0-9_-]*`` anchor, percent-decode + re-encode,
    resolve relative links against <base href> else the page URL, and map an
    empty path to '/'.
  * X4 uuid — MD5(url) with the query string optionally stripped
    (/root/reference/lib/polipus/storage/base.rb:11-17; golden value
    md5('http://www.google.com') = ed646a3334ca891fd3467db131372140,
    spec/polipus/storage/mongo_store_spec.rb:23).
  * X5 query-strip — ``url.gsub(/\\?.*$/, '')``
    (/root/reference/lib/polipus.rb:390,432).

Two tiers, by design:
  * **Column tier** (pure Catalyst expressions, whole-stage codegen,
    SQL-expressible for the DuckDB oracle): fragment/query strip, md5 uuid,
    host extraction, 60-bit hash, host salting. These run in the hot path of
    every wave and never leave the JVM.
  * **Pandas tier** (Arrow-vectorized, no per-row Python): full RFC-3986
    resolution (urljoin) used by canonicalization and link absolutization,
    where Catalyst has no built-in.
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Column tier (JVM-side, codegen'd, oracle-SQL-expressible)
# ---------------------------------------------------------------------------

# Anchor pattern from page.rb:173 (gsub(/#[a-zA-Z0-9_-]*$/, '')).
ANCHOR_RE = r"#[a-zA-Z0-9_-]*$"
QUERY_RE = r"\?.*$"
# scheme://(userinfo@)?host(:port)? — host group excludes userinfo and port.
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def strip_fragment(url: Column) -> Column:
    """X1 step 1: drop a trailing #anchor (page.rb:173 regex, verbatim)."""
    return F.regexp_replace(url, ANCHOR_RE, "")


def strip_query(url: Column) -> Column:
    """X5: drop ?query... (lib/polipus.rb:390)."""
    return F.regexp_replace(url, QUERY_RE, "")


def url_uuid(url: Column, include_query_string: bool = True) -> Column:
    """X4: storage key = MD5(url), query optionally stripped (base.rb:11-17)."""
    key = url if include_query_string else strip_query(url)
    return F.md5(key)


def url_host(url: Column) -> Column:
    """Host component, lowercased (URI#host semantics, excl. port/userinfo)."""
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def h60(col: Column) -> Column:
    """Deterministic 60-bit non-negative hash: first 15 hex chars of md5.

    Same value is computable in DuckDB as
    ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`` — the shared
    primitive for salting, bucketing, MinHash, and Bloom bit positions, so
    every hash-dependent operator has an exact SQL oracle.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def host_salt(url: Column, salt_factor: int = 1) -> Column:
    """Skew-defusing partition key: hash(host)*S + hash(url) % S.

    With salt_factor S>1 a hot host fans out over S adjacent partitions
    (north_rule: "explicit host-key salting to defuse hot-domain skew").
    """
    base = h60(url_host(url))
    if salt_factor <= 1:
        return base
    return base * salt_factor + F.pmod(h60(url), F.lit(salt_factor))


def bucket_of(salt: Column, n_buckets: int) -> Column:
    """Frontier partition bucket (stands in for Iceberg bucket(N, host_salt))."""
    return F.pmod(salt, F.lit(n_buckets)).cast("int")


# ---------------------------------------------------------------------------
# Pandas tier (Arrow batches; used inside mapInPandas/pandas_udf)
# ---------------------------------------------------------------------------

_ANCHOR_PAT = re.compile(ANCHOR_RE)


def _canon_one(link: str, base: str | None) -> str | None:
    """Python scalar core of X1 — called on pandas Series via .map below.

    Mirrors page.rb:171-195: anchor strip → decode+re-encode → resolve
    against base → empty path → '/'. Returns None for unresolvable links.
    """
    if link is None:
        return None
    link = _ANCHOR_PAT.sub("", str(link).strip())
    if not link:
        link = base or ""
    # decode + re-encode (page.rb:174-176): normalizes stray encodings;
    # safe set keeps reserved URL chars intact.
    link = quote(unquote(link), safe=":/?#[]@!$&'()*+,;=%~-_.")
    try:
        absolute = urljoin(base or "", link)
        parts = urlsplit(absolute)
    except ValueError:
        return None
    if not parts.scheme or not parts.netloc:
        return None
    path = parts.path or "/"
    host = (parts.hostname or "").lower()
    netloc = host
    if parts.port is not None:
        default = {"http": 80, "https": 443}.get(parts.scheme)
        if parts.port != default:
            netloc = f"{host}:{parts.port}"
    return urlunsplit((parts.scheme, netloc, path, parts.query, parts.fragment))


def canonicalize_pd(links: pd.Series, bases: pd.Series | None = None) -> pd.Series:
    """Vectorized X1 over Arrow batches.

    ``bases`` is the per-row resolution base (page URL or <base href>);
    None means links are already absolute.
    """
    if bases is None:
        return links.map(lambda u: _canon_one(u, None))
    return pd.Series(
        [_canon_one(u, b) for u, b in zip(links.tolist(), bases.tolist())],
        index=links.index,
        dtype="object",
    )


# NB: DataType object (not a DDL string) — a string return type would be
# re-parsed at worker-side module import where no SparkSession exists.
@F.pandas_udf(T.StringType())
def canonicalize_udf(links: pd.Series, bases: pd.Series) -> pd.Series:  # pragma: no cover
    return canonicalize_pd(links, bases)


def host_of(url: str | None) -> str | None:
    """Scalar host extractor used by the simulator and pandas kernels."""
    if url is None:
        return None
    m = re.match(HOST_RE, url)
    return m.group(1).lower() if m else None


PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"


def url_path_template(url: Column) -> Column:
    """URL pattern-mining template: the path with every digit run collapsed
    to ``N`` (``/page/2`` and ``/page/17`` → ``/page/N``), query/fragment
    dropped, empty path normalized to ``/``. Pure Column regexp — map-only,
    fused into the scan. Grouping a crawl's pages by (host, template)
    surfaces pagination families and crawler traps."""
    path = F.regexp_extract(url, PATH_RE, 1)
    return F.regexp_replace(
        F.when(path == "", "/").otherwise(path), r"[0-9]+", "N"
    )
