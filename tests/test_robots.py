"""X10/F2/F3/A6 — robotex_spec.rb ports (FIXTURES.md §3)."""

from polipus_spark.functions.robots import (
    allowed_scalar,
    crawl_delays_df,
    delay_scalar,
    filter_robots_allowed,
    parse_robots_text,
    robots_rules_df,
    wildcard_to_regex,
)
from polipus_spark.sources.corpus import ROBOTS_BODY_DEFAULT

HOST = "www.example.com"
RULES = parse_robots_text(HOST, ROBOTS_BODY_DEFAULT)


def test_disallow_per_agent():
    """robotex_spec.rb: bender denied /my_shiny_metal_ass, allowed /cigars."""
    assert not allowed_scalar(f"http://{HOST}/my_shiny_metal_ass", "bender", RULES)
    assert allowed_scalar(f"http://{HOST}/cigars", "bender", RULES)


def test_wildcard_agent_disallow():
    assert not allowed_scalar(f"http://{HOST}/login", "anybot", RULES)
    assert allowed_scalar(f"http://{HOST}/", "anybot", RULES)


def test_allow_then_disallow_is_denied():
    """robotex_spec.rb:62-67 quirk: Allow rules are dead code ⇒ /locked DENIED."""
    assert not allowed_scalar(f"http://{HOST}/locked", "anybot", RULES)


def test_crawl_delay():
    """robotex_spec.rb:74-84: msnbot 20, others none."""
    assert delay_scalar("msnbot", RULES) == 20
    assert delay_scalar("heartbot", RULES) is None


def test_wildcard_to_regex():
    assert wildcard_to_regex("/a*b") == "^/a.*b"
    assert wildcard_to_regex("/x.y") == r"^/x\.y"


def test_empty_values_skipped():
    rules = parse_robots_text("h", "User-agent: *\nDisallow:\nAllow:\n")
    assert [r for r in rules if r["rule"] in ("allow", "disallow")] == []


def test_missing_robots_allows_all():
    assert allowed_scalar("http://h/x", "any", [])


def test_spark_gate_matches_scalar(spark):
    """F2 dataflow gate ≡ scalar gate on the same rules."""
    from polipus_spark.sources.corpus import DOCS_SCHEMA

    docs = spark.createDataFrame(
        [(f"http://{HOST}/robots.txt", [("text", ROBOTS_BODY_DEFAULT, "", 0)], HOST, 200, None)],
        DOCS_SCHEMA,
    )
    rules_df = robots_rules_df(docs)
    paths = ["/", "/login", "/locked", "/cigars", "/my_shiny_metal_ass"]
    cands = spark.createDataFrame(
        [(f"http://{HOST}{p}", HOST) for p in paths], "url string, host string"
    )
    for ua in ["bender", "msnbot", "Polipus"]:
        got = {r["url"] for r in filter_robots_allowed(cands, rules_df, ua).collect()}
        want = {f"http://{HOST}{p}" for p in paths
                if allowed_scalar(f"http://{HOST}{p}", ua, RULES)}
        assert got == want, ua


def test_spark_crawl_delays(spark):
    from polipus_spark.sources.corpus import DOCS_SCHEMA

    docs = spark.createDataFrame(
        [(f"http://{HOST}/robots.txt", [("text", ROBOTS_BODY_DEFAULT, "", 0)], HOST, 200, None)],
        DOCS_SCHEMA,
    )
    rules_df = robots_rules_df(docs)
    assert crawl_delays_df(rules_df, "msnbot").collect()[0]["crawl_delay"] == 20
    assert crawl_delays_df(rules_df, "otherbot").count() == 0
