"""Canonicalization property + golden tests (SURVEY.md F15, §7.4)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from llm_scraper_ray.functions.urls import (
    canonicalize_url,
    host_of,
    path_of,
    url_sha1,
    url_sha1_hex,
)


def test_goldens():
    cases = {
        # scheme/host lowercase
        "HTTP://Example.COM/a": "http://example.com/a",
        # default port strip
        "https://example.com:443/x": "https://example.com/x",
        "http://example.com:80/x": "http://example.com/x",
        "http://example.com:8080/x": "http://example.com:8080/x",
        # fragment removed
        "http://example.com/a#frag": "http://example.com/a",
        # dot segments
        "http://example.com/a/./b/../c": "http://example.com/a/c",
        "http://example.com/../x": "http://example.com/x",
        # empty path
        "http://example.com": "http://example.com/",
        "http://example.com?q=1": "http://example.com/?q=1",
        # percent normalization: unreserved decoded, others uppercased
        "http://example.com/%7euser/%2fx%2F": "http://example.com/~user/%2Fx%2F",
        # raw space encoded
        "http://example.com/a b": "http://example.com/a%20b",
        # query kept, order preserved
        "http://example.com/p?b=2&a=1": "http://example.com/p?b=2&a=1",
        # trailing host dot
        "http://example.com./a": "http://example.com/a",
    }
    for raw, want in cases.items():
        assert canonicalize_url(raw) == want, raw


def test_non_http_rejected():
    for bad in ["mailto:x@y.z", "javascript:void(0)", "ftp://h/x", "", "/rel/path", "data:text/html,x"]:
        assert canonicalize_url(bad) is None


def test_hash_and_parts():
    canon = canonicalize_url("HTTPS://Host07.example:443/cat/item9?x=1")
    assert canon == "https://host07.example/cat/item9?x=1"
    assert host_of(canon) == "host07.example"
    assert path_of(canon) == "/cat/item9"
    assert len(url_sha1(canon)) == 20
    assert url_sha1_hex(canon) == url_sha1(canon).hex()


_path_chars = st.text(alphabet=string.ascii_letters + string.digits + "/._-~%:@ ", max_size=30)


@settings(max_examples=200, deadline=None)
@given(
    host=st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True),
    path=_path_chars,
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
)
def test_idempotent(scheme, host, path):
    url = f"{scheme}://{host}/{path}"
    c1 = canonicalize_url(url)
    assert c1 is not None
    assert canonicalize_url(c1) == c1  # canonicalization is idempotent


@settings(max_examples=100, deadline=None)
@given(host=st.from_regex(r"[a-z]{3,8}\.example", fullmatch=True), n=st.integers(0, 999))
def test_variant_collapse(host, n):
    """Messy variants of the same resource collapse to one canonical form."""
    base = f"https://{host}/cat/item{n}"
    variants = [
        base,
        f"https://{host.upper()}/cat/item{n}",
        f"https://{host}:443/cat/item{n}",
        f"https://{host}/cat/./item{n}",
        f"https://{host}/x/../cat/item{n}",
        f"https://{host}/cat/item{n}#sec",
    ]
    canons = {canonicalize_url(v) for v in variants}
    assert canons == {base}
