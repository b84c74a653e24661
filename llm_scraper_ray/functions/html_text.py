"""Deterministic HTML→text extraction and link harvesting (SURVEY.md E1, F7).

Re-implements the reference's generic cleaner — the byte-identity target —
from ``server/scripts/crawl4ai_extraction.py:55-59``::

    soup = BeautifulSoup(html, 'html.parser')
    for tag in soup(['script', 'style']):
        tag.decompose()
    return soup.get_text(separator=' ', strip=True)[:4000]

with the Python stdlib ``html.parser`` (bs4 is not a dependency). The
semantics reproduced exactly:

  - ``<script>``/``<style>`` subtrees contribute nothing (decompose);
  - comments, doctypes and processing instructions contribute nothing
    (bs4 ``get_text`` only yields ``NavigableString`` nodes);
  - character/entity references are resolved into their surrounding text run
    (bs4 builds on ``HTMLParser(convert_charrefs=True)`` — so do we, which
    makes text-node boundaries identical);
  - each text run is ``str.strip()``-ed, empty runs are dropped, survivors
    are joined with a single space (``separator=' ', strip=True``);
  - the result is truncated to 4000 characters.

``extract_text_and_links`` additionally harvests ``<a href>`` values in the
same single pass and absolutizes them with ``urljoin`` — the reference's
frontier-expansion behavior (``util/scraper/modules/amazon.py:69-89``,
``extract_product_urls.py:28,115-118``).
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

TRUNCATE_CHARS = 4000  # crawl4ai_extraction.py:59
_SKIP_SUBTREES = ("script", "style")  # crawl4ai_extraction.py:57


class _TextLinkParser(HTMLParser):
    """One-pass streaming extractor: visible text runs + raw hrefs."""

    def __init__(self, collect_links: bool) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.hrefs: list[str] | None = [] if collect_links else None
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
        elif self.hrefs is not None and tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
                    break

    def handle_startendtag(self, tag, attrs):
        # <script/> never enters CDATA mode; <a href=... /> still yields a link.
        if self.hrefs is not None and tag == "a":
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data):
        if not self._skip_depth:
            stripped = data.strip()
            if stripped:
                self.parts.append(stripped)


def _decode(html: str | bytes) -> str:
    if isinstance(html, (bytes, bytearray, memoryview)):
        return bytes(html).decode("utf-8", errors="replace")
    return html


def extract_text(html: str | bytes) -> str:
    """The E1 cleaner: visible text, single-space joined, 4000-char cap."""
    p = _TextLinkParser(collect_links=False)
    p.feed(_decode(html))
    p.close()
    return " ".join(p.parts)[:TRUNCATE_CHARS]


def extract_text_and_links(html: str | bytes, base_url: str) -> tuple[str, list[str]]:
    """E1 cleaner + absolutized outlinks in one parse.

    Links are ``urljoin(base_url, href)`` for every ``<a href>`` in document
    order, skipping empty and pure-fragment hrefs; scheme filtering and
    canonicalization happen downstream (urls.canonicalize_url returns None
    for non-http(s)).
    """
    p = _TextLinkParser(collect_links=True)
    p.feed(_decode(html))
    p.close()
    text = " ".join(p.parts)[:TRUNCATE_CHARS]
    links: list[str] = []
    assert p.hrefs is not None
    for href in p.hrefs:
        href = href.strip()
        if not href or href.startswith("#"):
            continue
        try:
            links.append(urljoin(base_url, href))
        except ValueError:
            continue
    return text, links
