"""Golden byte-identity tests for the E1 cleaner (SURVEY.md §7.4 hard part 1).

The expected strings encode the reference semantics of
``crawl4ai_extraction.py:55-59`` (BeautifulSoup html.parser, decompose
script/style, get_text(separator=' ', strip=True), [:4000]) character for
character.
"""

from llm_scraper_ray.functions.html_text import (
    TRUNCATE_CHARS,
    extract_text,
    extract_text_and_links,
)

GOLDENS = [
    # script/style subtrees dropped entirely
    (
        "<html><head><style>.x{color:red}</style><script>var a='<b>hi</b>';</script>"
        "</head><body><p>Hello</p><script>alert(1)</script><b>World</b></body></html>",
        "Hello World",
    ),
    # per-node strip, empty nodes dropped, single-space join
    (
        "<div>  a  \n <span> </span> <span>b</span>\n</div>",
        "a b",
    ),
    # internal whitespace inside one text run is preserved
    (
        "<p>two  spaces kept</p>",
        "two  spaces kept",
    ),
    # entities resolved inside the surrounding run (convert_charrefs)
    (
        "<p>AT&amp;T &lt;rocks&gt; &#65;nd more</p>",
        "AT&T <rocks> And more",
    ),
    # comments and doctype contribute nothing
    (
        "<!DOCTYPE html><!-- c --><p>x<!-- mid -->y</p>",
        "x y",
    ),
    # nested inline tags: each text run is a separate node
    (
        "<p>a<b>b</b>c</p>",
        "a b c",
    ),
    # unclosed script swallows to EOF
    (
        "<p>seen</p><script>never = 'shown'",
        "seen",
    ),
    # self-closed script does not enter CDATA mode
    (
        "<script/><p>ok</p>",
        "ok",
    ),
    # bytes input
    (
        b"<p>caf\xc3\xa9</p>",
        "café",
    ),
]


def test_goldens():
    for html, want in GOLDENS:
        assert extract_text(html) == want, html


def test_truncation():
    html = "<p>" + "x" * 10000 + "</p>"
    out = extract_text(html)
    assert len(out) == TRUNCATE_CHARS
    assert out == "x" * TRUNCATE_CHARS


def test_links_absolutized():
    html = (
        '<a href="/rel">r</a><a href="https://other.example/x">a</a>'
        '<a href="#frag">skip</a><a href="">skip</a>'
        '<a href="../up">u</a><a href="b.html">s</a>'
    )
    text, links = extract_text_and_links(html, "https://host.example/dir/page.html")
    assert text == "r a skip skip u s"
    assert links == [
        "https://host.example/rel",
        "https://other.example/x",
        "https://host.example/up",
        "https://host.example/dir/b.html",
    ]


def test_text_matches_text_only_parse():
    html = "<div><p>a</p><a href='/x'>b</a></div>"
    t1 = extract_text(html)
    t2, _ = extract_text_and_links(html, "https://h.example/")
    assert t1 == t2
