"""X6 JSON serde + X9 UA sampling.

X6 (page.rb:206-229, 245-269): the reference's wire format is JSON of
Page#to_hash with nil/empty fields dropped. Our frontier/pages rows ARE the
wire format, so serde is only needed for parity/interchange: ``page_to_json``
emits the same field set; ``page_from_json`` parses it back with re-defaulted
fields (from_hash semantics).

X9 (http.rb:84-90): when ``user_agent`` is a list the reference samples one
per request. Deterministic re-expression: index = hash(url) % n — stable
across retries and engines (the reference's rand is not reproducible;
determinism is required by our oracle protocol, deviation documented).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGE_JSON_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("referer", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("code", T.IntegerType()),
        T.StructField("aliases", T.ArrayType(T.StringType())),
        T.StructField("redirect_to", T.StringType()),
        T.StructField("response_time", T.IntegerType()),
        T.StructField("fetched", T.BooleanType()),
        T.StructField("fetched_at", T.LongType()),
        T.StructField("error", T.StringType()),
        T.StructField("user_data", T.MapType(T.StringType(), T.StringType())),
    ]
)


def page_to_json(df: DataFrame) -> DataFrame:
    """Serialize page rows to the reference's JSON message shape
    (ignore_null_fields drops nils like page.rb:224-229)."""
    cols = [f.name for f in PAGE_JSON_SCHEMA.fields if f.name in df.columns]
    return df.select(
        F.to_json(F.struct(*cols), {"ignoreNullFields": "true"}).alias("message")
    )


def page_from_json(df: DataFrame, col: str = "message") -> DataFrame:
    """Parse JSON messages back to page rows with Page.from_hash's
    re-defaulting (page.rb:245-264): absent numerics → 0 (Ruby nil.to_i),
    fetched → false, aliases → [], empty redirect_to → null; referer /
    error / user_data stay null."""
    p = df.select(F.from_json(F.col(col), PAGE_JSON_SCHEMA).alias("p")).select("p.*")
    return (
        p.withColumn("depth", F.coalesce(F.col("depth"), F.lit(0)))
        .withColumn("code", F.coalesce(F.col("code"), F.lit(0)))
        .withColumn("response_time", F.coalesce(F.col("response_time"), F.lit(0)))
        .withColumn("fetched", F.coalesce(F.col("fetched"), F.lit(False)))
        .withColumn(
            "aliases",
            F.coalesce(F.col("aliases"), F.array().cast("array<string>")),
        )
        .withColumn("redirect_to", F.nullif(F.col("redirect_to"), F.lit("")))
    )


def _inflate_pd(body, enc):
    import gzip
    import zlib

    import pandas as pd

    out = []
    for b, e in zip(body, enc):
        if b is None:
            out.append(None)
        elif e in ("gzip", "x-gzip"):
            out.append(gzip.decompress(bytes(b)))
        elif e == "deflate":
            out.append(zlib.decompress(bytes(b)))  # zlib-wrapped, like Ruby
        else:
            out.append(bytes(b))
    return pd.Series(out)


def inflate_body(body: Column, content_encoding: Column) -> Column:
    """X7: gzip / x-gzip / deflate response-body decompression
    (http.rb:280-288 ``handle_compression``). Arrow-batched pandas UDF over
    the binary column — stdlib zlib matches Ruby's Zlib semantics (deflate =
    zlib-wrapped stream, gzip = GzipReader). Unknown/absent encodings pass
    through unchanged."""
    import pandas as pd  # noqa: F401 — worker-side import check

    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_inflate_pd, T.BinaryType())(body, content_encoding)


def _deflate_pd(text):
    import zlib

    import pandas as pd

    return pd.Series(
        [None if t is None else zlib.compress(t.encode("utf-8")) for t in text]
    )


def deflate_body(text: Column) -> Column:
    """X8: opt-in body compression before the store write
    (mongo_store.rb:29 / rethink_store.rb:33 ``Zlib::Deflate.deflate`` when
    ``compress_body``). Arrow-batched pandas UDF: utf-8 string → zlib-wrapped
    binary, matching Ruby's Zlib default stream format."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_deflate_pd, T.BinaryType())(text)


def _inflate_str_pd(body):
    import zlib

    import pandas as pd

    return pd.Series(
        [None if b is None else zlib.decompress(bytes(b)).decode("utf-8")
         for b in body]
    )


def inflate_stored_body(body: Column) -> Column:
    """X8 read path (mongo_store.rb:70-77 ``Zlib::Inflate`` on load): the
    stored zlib binary → utf-8 string."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_inflate_str_pd, T.StringType())(body)


def sample_user_agent(url: Column, user_agents: list[str]) -> Column:
    """X9: deterministic UA pick — element_at(list, hash(url) % n + 1)."""
    if len(user_agents) == 1:
        return F.lit(user_agents[0])
    idx = (
        F.conv(F.substring(F.md5(url), 1, 7), 16, 10).cast("bigint")
        % len(user_agents)
    ).cast("int") + 1
    return F.element_at(F.array(*[F.lit(u) for u in user_agents]), idx)
