"""X2/F9/F10/J9 — page_spec.rb ports + span-order invariant."""

from pyspark.sql import functions as F

from polipus_spark.functions.links import extract_links, spans_in_order
from polipus_spark.sources.corpus import DOCS_SCHEMA


def _doc(spark, doc_id, spans):
    return spark.createDataFrame(
        [(doc_id, spans, "www.google.com", 200, None)], DOCS_SCHEMA
    )


def test_page_spec_links(spark):
    """page_spec.rb:7-31: 5 hrefs, aliases {www.google.com, google.com}
    ⇒ 4 distinct in-domain links."""
    body = (
        '<a href="/page/1">1</a> <a href="/page/2">2</a> '
        '<a href="http://www.google.com/page/3">3</a> '
        '<a href="http://google.com/page/3">3b</a> '
        '<a href="http://not.google.com/page/3">x</a>'
    )
    docs = _doc(spark, "http://www.google.com/", [("text", body, "", 0)])
    links = extract_links(docs, domain_aliases=["google.com"])
    got = sorted(r["link"] for r in links.collect())
    assert got == [
        "http://google.com/page/3",
        "http://www.google.com/page/1",
        "http://www.google.com/page/2",
        "http://www.google.com/page/3",
    ]


def test_media_spans_yield_no_links(spark):
    """F9: media spans are never parsed for links."""
    spans = [
        ("media", 'href="/sneaky"', "img://x", 0),
        ("text", '<a href="/ok">ok</a>', "", 10),
    ]
    docs = _doc(spark, "http://www.google.com/", spans)
    got = [r["link"] for r in extract_links(docs).collect()]
    assert got == ["http://www.google.com/ok"]


def test_span_order_and_link_pos(spark):
    """Span-sequence order (by offset) defines link first-occurrence order."""
    spans = [
        ("text", '<a href="/b">b</a>', "", 20),   # second by offset
        ("text", '<a href="/a">a</a> <a href="/b">early-dup</a>', "", 10),
    ]
    docs = _doc(spark, "http://www.google.com/", spans)
    rows = extract_links(docs).orderBy("link_pos").collect()
    assert [(r["link"], r["link_pos"]) for r in rows] == [
        ("http://www.google.com/a", 0),
        ("http://www.google.com/b", 1),  # J9 dedup keeps first occurrence
    ]


def test_base_href(spark):
    """page.rb:157-165: <base href> wins over the page URL."""
    spans = [("text", '<base href="http://www.google.com/sub/"> <a href="x">x</a>', "", 0)]
    docs = _doc(spark, "http://www.google.com/", spans)
    got = [r["link"] for r in extract_links(docs).collect()]
    assert got == ["http://www.google.com/sub/x"]


def test_spans_in_order_invariant(spark):
    """Per-row invariant: (kind, text, media_ref, order) with order = asc offset."""
    spans = [("media", "", "m2", 30), ("text", "t1", "", 10), ("media", "", "m1", 20)]
    docs = _doc(spark, "http://www.google.com/", spans)
    row = docs.select(spans_in_order(F.col("spans")).alias("s")).collect()[0]["s"]
    assert [(x["kind"], x["media_ref"], x["offset"]) for x in row] == [
        ("text", "", 10), ("media", "m1", 20), ("media", "m2", 30),
    ]
