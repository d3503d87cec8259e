"""X6 JSON serde round-trip + X7 inflate + X9 deterministic UA sampling."""

import gzip
import zlib

from pyspark.sql import functions as F

from polipus_spark.functions.serde import (
    inflate_body, page_from_json, page_to_json, sample_user_agent,
)


def test_json_roundtrip_drops_nulls(spark):
    rows = [("http://a.com/", None, 1, 200, [], None, 5, True, 100, None, {"k": "v"})]
    df = spark.createDataFrame(
        rows,
        "url string, referer string, depth int, code int, aliases array<string>, "
        "redirect_to string, response_time int, fetched boolean, fetched_at bigint, "
        "error string, user_data map<string,string>",
    )
    msg = page_to_json(df).collect()[0]["message"]
    assert '"referer"' not in msg  # nil fields dropped (page.rb:224-229)
    assert '"url":"http://a.com/"' in msg
    back = page_from_json(spark.createDataFrame([(msg,)], "message string")).collect()[0]
    assert back["url"] == "http://a.com/" and back["referer"] is None
    assert back["depth"] == 1 and back["user_data"] == {"k": "v"}


def test_page_from_json_redefaults_absent_fields(spark):
    """Page.from_hash re-defaulting (page.rb:245-264): absent numerics → 0,
    fetched → false, aliases → [], empty redirect_to → null."""
    msg = '{"url":"http://a.com/","redirect_to":""}'
    back = page_from_json(spark.createDataFrame([(msg,)], "message string")).collect()[0]
    assert back["depth"] == 0 and back["code"] == 0 and back["response_time"] == 0
    assert back["fetched"] is False and back["aliases"] == []
    assert back["redirect_to"] is None and back["error"] is None


def test_inflate_body_gzip_deflate_passthrough(spark):
    """X7 (http.rb:280-288): gzip/x-gzip via GzipReader semantics, deflate =
    zlib-wrapped inflate, anything else passes through."""
    plain = b"<html>hello polipus</html>"
    rows = [
        (gzip.compress(plain), "gzip"),
        (gzip.compress(plain), "x-gzip"),
        (zlib.compress(plain), "deflate"),
        (plain, "identity"),
        (plain, None),
        (None, "gzip"),
    ]
    df = spark.createDataFrame(rows, "body binary, enc string")
    out = [
        bytes(r["b"]) if r["b"] is not None else None
        for r in df.select(
            inflate_body(F.col("body"), F.col("enc")).alias("b")
        ).collect()
    ]
    assert out == [plain, plain, plain, plain, plain, None]


def test_ua_sampling_deterministic(spark):
    uas = ["bot-a", "bot-b", "bot-c"]
    df = spark.createDataFrame([(f"http://h.com/{i}",) for i in range(50)], "url string")
    a = [r["ua"] for r in df.select(sample_user_agent(F.col("url"), uas).alias("ua")).collect()]
    b = [r["ua"] for r in df.select(sample_user_agent(F.col("url"), uas).alias("ua")).collect()]
    assert a == b  # stable across evaluations
    assert len(set(a)) == 3  # all UAs used
    single = df.select(sample_user_agent(F.col("url"), ["only"]).alias("ua")).first()["ua"]
    assert single == "only"
