"""Property-based hardening of the URL canonicalizer (pure-Python kernel
behind the Arrow UDF — testable without a SparkSession, so hypothesis can
hammer it)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from polipus_spark.functions.urls import _canon_one

url_chars = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "S"), max_codepoint=0x2FF
    ),
    max_size=60,
)
hostish = st.from_regex(r"[a-z]{1,10}(\.[a-z]{1,6}){1,3}", fullmatch=True)


@settings(max_examples=300, deadline=None)
@given(url_chars)
def test_canon_never_raises_on_garbage(s):
    _canon_one(s, None)
    _canon_one(s, "http://base.example.com/dir/page.html")


@settings(max_examples=300, deadline=None)
@given(hostish, url_chars)
def test_canon_idempotent(host, path):
    url = f"http://{host}/{path}"
    once = _canon_one(url, None)
    if once is not None:
        assert _canon_one(once, None) == once


@settings(max_examples=200, deadline=None)
@given(hostish)
def test_canon_absolute_http_keeps_scheme_and_host(host):
    out = _canon_one(f"http://{host}", None)
    assert out is not None
    assert out.startswith("http://")
    assert host.lower() in out


# ----------------------------------------------------- robots pure kernels

import re


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_parse_robots_never_raises(body):
    from polipus_spark.functions.robots import parse_robots_text

    rules = parse_robots_text("h.example.com", body)
    assert isinstance(rules, list)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
               max_size=30))
def test_wildcard_regex_matches_own_prefix(pattern):
    """The compiled rule must match any URL path that starts with the
    pattern (with * consuming anything), and always compile."""
    from polipus_spark.functions.robots import wildcard_to_regex

    rx = re.compile(wildcard_to_regex(pattern))
    literal = pattern.replace("*", "x")
    assert rx.match(literal + "/suffix") or "*" in pattern
    expanded = pattern.replace("*", "anything/here")
    assert rx.match(expanded + "?q=1")
