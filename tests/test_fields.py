"""DOM/selector subset + field extraction + sessionizer tests (E2/E3/E6/E7/F9)."""

from llm_scraper_ray.functions.dom import parse_dom, select, select_one
from llm_scraper_ray.functions.fields import (
    extract_fields,
    extract_headings,
    parse_tables_text,
    sessionize,
)

PRODUCT_HTML = """
<html><body>
<div id="main">
  <h1 class="h4 title">Acme Widget 3000</h1>
  <a class="c-button-link" href="/brand">Acme Corp</a>
  <div class="mb-200 pb-200">
    <ul><li>Fast</li><li>Cheap</li></ul>
  </div>
  <div class="body-copy-lg">A great widget.
Multi line.</div>
  <table><tr><th>Spec</th><th>Value</th></tr>
         <tr><td>Weight</td><td>1kg</td></tr>
         <tr><td>Color</td><td>Red</td></tr></table>
</div>
</body></html>
"""

CONFIG = {
    "text_content": {
        "product_name": ["h1.missing", "h1.h4"],
        "manufacturer": "a.c-button-link",
        "highlights": ["div.mb-200.pb-200"],
        "description": "div.body-copy-lg",
        "buttons": {"specifications": {"button.show-specs": "table"}},
    },
    "skip": {"div#unavailable": "currently unavailable"},
}


def test_selector_subset():
    root = parse_dom(PRODUCT_HTML)
    assert select_one(root, "h1").text_content() == "Acme Widget 3000"
    assert select_one(root, "#main > h1.h4.title") is not None
    assert [n.text_content() for n in select(root, "ul li")] == ["Fast", "Cheap"]
    assert select_one(root, "a[href=/brand]").text_content() == "Acme Corp"
    assert select_one(root, "h2") is None
    # group selector, doc order, dedup
    got = [n.tag for n in select(root, "li, h1, li")]
    assert got == ["h1", "li", "li"]


def test_extract_fields():
    fields = extract_fields(PRODUCT_HTML, CONFIG)
    assert fields["product_name"] == "Acme Widget 3000"
    assert fields["manufacturer"] == "Acme Corp"
    # newline fold to | (scrape_eccomerce.py:108-109)
    assert fields["description"] == "A great widget.|Multi line."
    assert "Weight" in fields["specifications"] and "1kg" in fields["specifications"]


def test_skip_marker():
    html = '<div id="unavailable">This item is currently unavailable.</div><h1 class="h4">X</h1>'
    assert extract_fields(html, CONFIG) == {}


def test_tables_text():
    out = parse_tables_text(parse_dom(PRODUCT_HTML))
    lines = [l.strip() for l in out.splitlines()]
    assert lines[0].split() == ["Spec", "Value"]
    assert "Weight" in out and "Color" in out


def test_headings_and_sessionize():
    html = (
        "<h1>Intro</h1><h2>Scope</h2><p>First para.</p><p>Second.</p>"
        "<h2>Data</h2><p>Body.</p><h3>End</h3>"
    )
    texts = extract_headings(html)
    assert texts == [
        "H1: Intro",
        "H2: Scope",
        "P: First para.",
        "P: Second.",
        "H2: Data",
        "P: Body.",
        "H3: End",
    ]
    sections = sessionize(texts)
    # reference fold semantics (scrape_pp.py:26-47), quirks preserved: the
    # ":"-split keeps the leading space of each content piece, the first key
    # chains from "", consecutive paragraphs join with " ", a section flushes
    # only on a CONTENT→HEADING transition (so the trailing "End" run drops)
    assert sections == {
        " ->  Intro ->  Scope": " First para. Second.",
        " Data": " Body.",
    }
