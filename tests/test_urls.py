"""X1/X4/X5 golden cases ported from the reference specs (FIXTURES.md §4)."""

import pandas as pd
from pyspark.sql import functions as F

from polipus_spark.functions.urls import (
    canonicalize_pd,
    h60,
    host_of,
    strip_fragment,
    strip_query,
    url_host,
    url_uuid,
)


def test_uuid_golden(spark):
    """mongo_store_spec.rb:23: md5('http://www.google.com')."""
    df = spark.createDataFrame([("http://www.google.com",)], "url string")
    got = df.select(url_uuid(F.col("url")).alias("u")).collect()[0]["u"]
    assert got == "ed646a3334ca891fd3467db131372140"


def test_uuid_query_strip_mode(spark):
    """mongo_store_spec.rb:53-69: query-insensitive uuid mode."""
    df = spark.createDataFrame(
        [
            ("http://www.asd.com/?asd=lol",),
            ("http://www.asd.com/?asdas=dasda&adsda=1",),
            ("http://www.asd.com?asd=lol",),
            ("http://www.asd.com",),
        ],
        "url string",
    )
    rows = df.select(url_uuid(F.col("url"), include_query_string=False).alias("u")).collect()
    assert rows[0]["u"] == rows[1]["u"]  # same uuid with slash
    assert rows[2]["u"] == rows[3]["u"]  # same uuid without slash


def test_canonicalize_anchor_and_paths():
    """page.rb:171-195 semantics."""
    s = canonicalize_pd(
        pd.Series(
            [
                "http://a.com/x#frag_1",     # anchor stripped
                "http://a.com",              # empty path → /
                "/rel/path",                 # resolved vs base
                "page/2?q=1",                # relative w/ query kept
                "http://a.com:80/x",         # default port dropped
                "http://a.com:8080/x",       # explicit port kept
            ]
        ),
        pd.Series(["http://a.com/"] * 6),
    )
    assert s.tolist() == [
        "http://a.com/x",
        "http://a.com/",
        "http://a.com/rel/path",
        "http://a.com/page/2?q=1",
        "http://a.com/x",
        "http://a.com:8080/x",
    ]


def test_strip_cols(spark):
    df = spark.createDataFrame([("http://a.com/x?q=1#frag",)], "url string")
    row = df.select(
        strip_fragment(F.col("url")).alias("nf"),
        strip_query(F.col("url")).alias("nq"),
        url_host(F.col("url")).alias("h"),
    ).collect()[0]
    assert row["nf"] == "http://a.com/x?q=1"
    assert row["nq"] == "http://a.com/x"
    assert row["h"] == "a.com"


def test_h60_matches_python(spark):
    """h60 must equal the simulator's md5-based hash (cross-engine oracle)."""
    import hashlib

    urls = ["http://a.com/", "http://b.com/x?q=1", "abc"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["h"] for r in df.select(h60(F.col("url")).alias("h")).collect()]
    want = [int(hashlib.md5(u.encode()).hexdigest()[:15], 16) for u in urls]
    assert got == want


def test_host_of_scalar():
    assert host_of("http://User:pw@WWW.Ex.com:8080/p?q") == "www.ex.com"
    assert host_of("not a url") is None


def test_url_path_template(spark):
    from pyspark.sql import functions as F

    from polipus_spark.functions.urls import url_path_template

    cases = {
        "http://a.com/page/2": "/page/N",
        "http://a.com/page/17?q=3#frag": "/page/N",
        "http://a.com": "/",
        "http://a.com/": "/",
        "https://a.com/v2/items/99/detail": "/vN/items/N/detail",
        "http://a.com/plain/path": "/plain/path",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["t"] for r in
           df.select("url", url_path_template(F.col("url")).alias("t"))
           .collect()}
    assert got == cases
