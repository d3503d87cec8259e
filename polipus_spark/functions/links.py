"""X2 link extraction from interleaved text+media spans.

Reference: Page#links (/root/reference/lib/polipus/page.rb:66-78) — distinct
``//a[@href]`` anchors from the HTML body, made absolute (page.rb:171-195)
and filtered to the page's domain (F10, page.rb:201-204; aliases injected at
lib/polipus.rb:398-400). Non-HTML bodies yield no links (F9, page.rb:125-127)
— here: only ``kind='text'`` spans are parsed, ``media`` spans never are.

Spark shape: everything except RFC-3986 resolution stays JVM-side —
span sort / flatten / regexp_extract_all / posexplode are Catalyst
expressions inside whole-stage codegen; the single Python hop is one
Arrow-vectorized canonicalization UDF. Output keeps the first-occurrence
position of each link (span-order, then in-span order) so downstream ``seq``
assignment is deterministic under any parallelism (SURVEY §4 custom #2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polipus_spark.functions.urls import canonicalize_udf, url_host

# The corpus embeds anchors as <a href="..."> inside text spans; this regex
# IS the parse (the reference's Nokogiri //a[@href] over real HTML — anchor
# tags only, so <base href> must NOT match). Identical pattern is used by
# the oracle simulator and the DuckDB oracle SQL.
HREF_RE = r'<a [^>]*?href="([^"]+)"'

# <base href="..."> support (page.rb:157-165): first base tag wins.
BASE_RE = r'<base href="([^"]+)"'


def spans_in_order(spans: Column) -> Column:
    """Sort spans by ascending offset (the span-order invariant).

    Re-keys each struct to (offset, kind, text, media_ref) so sort_array's
    lexicographic struct ordering sorts by offset first.
    """
    return F.sort_array(
        F.transform(
            spans,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )


def raw_hrefs(spans: Column) -> Column:
    """Array of raw href strings in document order (text spans only)."""
    return F.flatten(
        F.transform(
            spans_in_order(spans),
            lambda s: F.when(
                s["kind"] == "text", F.regexp_extract_all(s["text"], F.lit(HREF_RE), 1)
            ).otherwise(F.array().cast("array<string>")),
        )
    )


def base_href(spans: Column) -> Column:
    """First <base href> across text spans, else null (page.rb:157-165)."""
    joined = F.concat_ws(
        "\n",
        F.transform(
            spans_in_order(spans),
            lambda s: F.when(s["kind"] == "text", s["text"]).otherwise(F.lit("")),
        ),
    )
    b = F.regexp_extract(joined, BASE_RE, 1)
    return F.when(b == "", None).otherwise(b)


def extract_links(
    docs: DataFrame,
    url_col: str = "doc_id",
    spans_col: str = "spans",
    domain_aliases: list[str] | None = None,
    in_domain: bool = True,
) -> DataFrame:
    """(page url, spans) → (url, link, link_pos): distinct in-domain links.

    link_pos = first-occurrence index in document order (J9 dedup keeps the
    earliest, matching the reference's insertion-ordered Set, page.rb:67-77).
    """
    aliases = list(domain_aliases or [])
    page_url = F.col(url_col)

    exploded = (
        docs.select(
            page_url.alias("_page_url"),
            base_href(F.col(spans_col)).alias("_base"),
            F.posexplode_outer(raw_hrefs(F.col(spans_col))).alias("_pos", "_raw"),
        )
        .where(F.col("_raw").isNotNull())
        # resolve against <base href> if present, else the page URL (X1)
        .withColumn(
            "link",
            canonicalize_udf(F.col("_raw"), F.coalesce(F.col("_base"), F.col("_page_url"))),
        )
        .where(F.col("link").isNotNull())
    )

    if in_domain:
        link_host = url_host(F.col("link"))
        page_host = url_host(F.col("_page_url"))
        cond = link_host == page_host
        if aliases:
            cond = cond | link_host.isin(aliases)
        exploded = exploded.where(cond)

    return (
        exploded.groupBy(F.col("_page_url").alias("url"), "link")
        .agg(F.min("_pos").alias("link_pos"))
    )
