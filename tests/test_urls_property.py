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
