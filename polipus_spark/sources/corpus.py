"""Deterministic synthetic web corpus (FIXTURES.md §1, seed=42).

Emits the exact ``input_hint`` shape: (doc_id string, spans
array<struct<kind,text,media_ref,offset>>), plus convenience columns
host / code / redirect_to mirroring Page#code semantics
(/root/reference/lib/polipus/page.rb:133-151). The same rows feed the
Spark tables and the pure-Python oracle simulator, so both sides crawl the
identical "web" with zero external data.

Two tiers:
  * ``gen_corpus`` — driver-side list[dict] for correctness tests
    (hundreds..tens of thousands of docs).
  * ``synthetic_frontier`` — pure Column-expression generator for the
    throughput bench: millions of frontier URLs with Zipf host skew,
    materialized distributed (no Python in the loop).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType(), False),
                        T.StructField("text", T.StringType(), True),
                        T.StructField("media_ref", T.StringType(), True),
                        T.StructField("offset", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("host", T.StringType(), False),
        T.StructField("code", T.IntegerType(), False),
        T.StructField("redirect_to", T.StringType(), True),
    ]
)

ROBOTS_BODY_DEFAULT = """User-Agent: msnbot
Crawl-Delay: 20

User-Agent: bender
Disallow: /my_shiny_metal_ass

User-Agent: *
Disallow: /login
Allow: /

Disallow: /locked
Allow: /locked
"""


def _zipf_count(rank: int, max_docs: int, s: float = 1.2) -> int:
    """Deterministic Zipf-ish docs-per-host: rank 0 is the hot host."""
    return max(2, min(max_docs, int(round(max_docs / (rank + 1) ** s))))


def gen_corpus(
    n_hosts: int = 8,
    max_docs_per_host: int = 30,
    seed: int = 42,
    cross_host_frac: float = 0.2,
    media_doc_frac: float = 0.1,
    robots_frac: float = 0.75,
    with_redirect_chain: bool = True,
) -> list[dict]:
    """Build the synthetic web. Returns list of dicts matching DOCS_SCHEMA."""
    rng = random.Random(seed)
    hosts = [f"host{i}.example.com" for i in range(n_hosts)]
    # every host's page list (page 0 == root "/")
    pages: dict[str, list[str]] = {}
    for rank, h in enumerate(hosts):
        n = _zipf_count(rank, max_docs_per_host)
        urls = [f"http://{h}/"] + [f"http://{h}/page/{j}" for j in range(1, n)]
        # a couple of disallowed-by-robots paths on each host
        urls += [f"http://{h}/login/{j}" for j in range(2)]
        pages[h] = urls

    docs: list[dict] = []

    def link_forms(target: str, rng: random.Random) -> str:
        """Emit the target in a randomized surface form to exercise X1/X4/X5."""
        form = rng.random()
        path = target.split("/", 3)[-1] if target.count("/") >= 3 else ""
        if form < 0.35:
            return "/" + path  # absolute-path relative
        if form < 0.45:
            return "/" + path + "#frag_1"  # anchor to strip
        if form < 0.55:
            return "/" + path + "?utm=x&k=1"  # query string
        return target  # fully absolute

    for h in hosts:
        urls = pages[h]
        for idx, url in enumerate(urls):
            spans: list[dict] = []
            offset = 0
            n_text = rng.randint(1, 3)
            is_media_doc = rng.random() < media_doc_frac
            for t in range(n_text):
                n_links = rng.randint(0, 4)
                parts = [f"Prose span {t} of {url} ."]
                for _ in range(n_links):
                    if rng.random() < cross_host_frac and n_hosts > 1:
                        other = hosts[rng.randrange(n_hosts)]
                        tgt = rng.choice(pages[other])
                        parts.append(f'see <a href="{tgt}">x</a>')
                    else:
                        tgt = rng.choice(urls)
                        parts.append(f'see <a href="{link_forms(tgt, rng)}">y</a>')
                spans.append(
                    {"kind": "text", "text": " ".join(parts), "media_ref": "", "offset": offset}
                )
                offset += 10
                if is_media_doc and t < n_text - 1:
                    # media spans interleave and must never yield links (F9)
                    spans.append(
                        {
                            "kind": "media",
                            "text": "",
                            "media_ref": f"img://{h}/{idx}/{t}",
                            "offset": offset,
                        }
                    )
                    offset += 10
            docs.append(
                {"doc_id": url, "spans": spans, "host": h, "code": 200, "redirect_to": None}
            )

        # robots.txt for most hosts; absent => allow-all (robotex.rb:17-20)
        if rng.random() < robots_frac:
            docs.append(
                {
                    "doc_id": f"http://{h}/robots.txt",
                    "spans": [
                        {
                            "kind": "text",
                            "text": ROBOTS_BODY_DEFAULT,
                            "media_ref": "",
                            "offset": 0,
                        }
                    ],
                    "host": h,
                    "code": 200,
                    "redirect_to": None,
                }
            )

    if with_redirect_chain and n_hosts >= 2:
        h0, h1 = hosts[0], hosts[1]
        # same-host chain of length 6 exercises redirect_limit=5 (polipus.rb:31)
        for i in range(6):
            docs.append(
                {
                    "doc_id": f"http://{h0}/chain/{i}",
                    "spans": [],
                    "host": h0,
                    "code": 301,
                    "redirect_to": f"http://{h0}/chain/{i + 1}"
                    if i < 5
                    else f"http://{h0}/",
                }
            )
        # short chain that resolves in 2 hops
        docs.append(
            {
                "doc_id": f"http://{h0}/moved",
                "spans": [],
                "host": h0,
                "code": 302,
                "redirect_to": f"http://{h0}/page/1",
            }
        )
        # cross-host redirect: must NOT be followed (http.rb:276-278)
        docs.append(
            {
                "doc_id": f"http://{h0}/offsite",
                "spans": [],
                "host": h0,
                "code": 301,
                "redirect_to": f"http://{h1}/",
            }
        )
    return docs


def grow_corpus(docs: list[dict], n_new: int = 2) -> list[dict]:
    """Deterministically "age" a corpus one recrawl period: the web grew.

    Returns a NEW doc list where every host root gains one appended text
    span linking to ``n_new`` brand-new pages under ``/new/<j>`` (which are
    added as real 200 docs). Nothing else changes — existing spans keep
    their bytes and offsets, so a page re-downloaded against the grown
    corpus differs from its stored copy ONLY by the appended span (and
    pages that are not re-downloaded keep byte-identical stored spans).
    This is the recrawl-delta fixture: seeds re-fetched on the next
    session (S1 — seeds bypass the tracker) discover the new URLs, while
    non-seed pages stay untouched in the store."""
    by_id = {d["doc_id"]: d for d in docs}
    grown: list[dict] = []
    hosts = sorted({d["host"] for d in docs})
    for d in docs:
        root = f"http://{d['host']}/"
        if d["doc_id"] == root and d["code"] == 200:
            links = " ".join(
                f'new <a href="http://{d["host"]}/new/{j}">n{j}</a>'
                for j in range(n_new)
            )
            top = max(s["offset"] for s in d["spans"]) if d["spans"] else 0
            d = dict(d, spans=list(d["spans"]) + [{
                "kind": "text", "text": f"What's new: {links}",
                "media_ref": "", "offset": top + 1000,
            }])
        grown.append(d)
    for h in hosts:
        if f"http://{h}/" not in by_id:
            continue
        for j in range(n_new):
            doc_id = f"http://{h}/new/{j}"
            if doc_id in by_id:
                continue
            grown.append({
                "doc_id": doc_id,
                "spans": [{
                    "kind": "text",
                    "text": f'Fresh page {j} on {h} . back to '
                            f'<a href="http://{h}/">home</a>',
                    "media_ref": "", "offset": 0,
                }],
                "host": h, "code": 200, "redirect_to": None,
            })
    return grown


def corpus_df(spark: SparkSession, docs: list[dict]) -> DataFrame:
    rows = [
        (
            d["doc_id"],
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]],
            d["host"],
            d["code"],
            d["redirect_to"],
        )
        for d in docs
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def synthetic_frontier(
    spark: SparkSession,
    n_urls: int,
    n_hosts: int = 2000,
    zipf_s: float = 1.2,
    n_partitions: int | None = None,
) -> DataFrame:
    """Distributed synthetic frontier for the throughput bench (FIXTURES §6).

    Pure Column expressions over ``spark.range`` — scales to 10^7+ locally and
    arbitrarily on a cluster; the 10^10 design just raises ``n_urls``. Host
    popularity is Zipf-skewed via an inverse-CDF trick on a deterministic
    60-bit hash, so hot-host skew is real and the salting path is exercised.
    """
    df = spark.range(0, n_urls, 1, n_partitions or spark.sparkContext.defaultParallelism)
    # u in [0,1) deterministic per id; host_rank = floor(n_hosts * u^alpha)
    # gives a heavy head (rank 0 hottest) approximating Zipf(s).
    u = (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
         .cast("double") / F.lit(float(2 ** 60)))
    alpha = zipf_s + 1.0
    host_rank = F.least(
        F.lit(n_hosts - 1), F.floor(F.lit(float(n_hosts)) * F.pow(u, F.lit(alpha)))
    ).cast("int")
    host = F.concat(F.lit("host"), host_rank.cast("string"), F.lit(".example.com"))
    url = F.concat(F.lit("http://"), host, F.lit("/page/"), F.col("id").cast("string"))
    return df.select(
        url.alias("url"),
        host.alias("host"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("priority"),
        F.col("id").alias("seq"),
        F.lit(0).cast("bigint").alias("discovery_ts"),
    )
