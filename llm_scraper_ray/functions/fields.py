"""Config-driven field extraction over stored HTML (SURVEY.md E2/E3/E6/E7/F9).

Static re-statement of the reference's Playwright-locator extraction loop
(``server/scripts/scrape_eccomerce.py:66-157``, ``extract_pages.py:30-74``)
over the DOM of an already-fetched page, plus the privacy-policy heading
pipeline (``server/scripts/scrape_pp.py:26-47,103-110``).

Semantics preserved:
  - skip markers: if any configured skip-selector's text contains the marker
    string, the page yields an empty dict (``scrape_eccomerce.py:66-74``);
  - per tag, a scalar selector or a fallback LIST tried in order; first
    selector with ≥1 match wins; value = first match's ``text_content()``;
  - value post-processing folds newlines: ``"|".join(content.strip().split("\\n"))``
    (``scrape_eccomerce.py:108-109``);
  - "buttons" entries map a button name → {button_selector: content_selector};
    the click is not reproducible statically, so we evaluate the CONTENT
    selector directly (the content exists in stored HTML); a ``"table"``
    content selector parses all ``<table>`` elements into DataFrames and
    concatenates ``to_string(index=False)`` (``scrape_eccomerce.py:126-146``).
"""

from __future__ import annotations

import pandas as pd

from .dom import Node, parse_dom, select

HEADINGS = ["H1", "H2", "H3"]  # scrape_pp.py:23
CONTENT = ["P"]  # scrape_pp.py:24


def _fold(content: str) -> str:
    # scrape_eccomerce.py:108-109
    return "|".join(content.strip().split("\n"))


def page_is_skipped(root: Node, config: dict) -> bool:
    """F9 unavailable-page check (scrape_eccomerce.py:66-74)."""
    for selector, marker in config.get("skip", {}).items():
        for node in select(root, selector):
            if marker in node.text_content():
                return True
    return False


def parse_tables_text(root: Node) -> str | None:
    """E3 table extraction: all <table> → DataFrames → concat to_string.

    Mirrors ``scrape_eccomerce.py:126-146`` (pd.read_html + concat +
    to_string(index=False)) without the lxml dependency: header = first row's
    cells, data = remaining rows, ragged rows padded/truncated to header
    width.
    """
    dfs = []
    for table in select(root, "table"):
        rows = []
        for tr in select(table, "tr"):
            cells = [
                c.text_content().strip()
                for c in tr.children
                if isinstance(c, Node) and c.tag in ("td", "th")
            ]
            if cells:
                rows.append(cells)
        if len(rows) >= 2:
            width = len(rows[0])
            data = [(r + [""] * width)[:width] for r in rows[1:]]
            dfs.append(pd.DataFrame(data, columns=rows[0]))
    if not dfs:
        return None
    combined = pd.concat(dfs, ignore_index=True)
    return combined.to_string(index=False)


def extract_fields(html: str | bytes, config: dict) -> dict[str, str]:
    """E2: per-tag selector extraction with fallback lists (scrape_eccomerce.py:77-111)."""
    root = parse_dom(html)
    text: dict[str, str] = {}
    if page_is_skipped(root, config):
        return text
    text_content_cfg = config.get("text_content", config.get("text", {}))
    for tag, sel in text_content_cfg.items():
        if tag == "buttons":
            continue
        content = None
        selectors = sel if isinstance(sel, list) else [sel]
        for selector in selectors:
            nodes = select(root, selector)
            if nodes:
                content = nodes[0].text_content()
                break
        if content:
            text[tag] = _fold(content)
    for button, mapping in text_content_cfg.get("buttons", {}).items():
        for _button_selector, content_selector in mapping.items():
            if content_selector == "table":
                content = parse_tables_text(root)
                if content:
                    text[button] = content
                    break
            else:
                nodes = select(root, content_selector)
                if nodes:
                    content = nodes[0].text_content()
                    if content:
                        text[button] = _fold(content)
                        break
    return text


def extract_headings(html: str | bytes) -> list[str]:
    """E6: h1/h2/h3/p texts as '"TAG: text"' in doc order (scrape_pp.py:103-110)."""
    root = parse_dom(html)
    out = []
    for node in root.iter_elements():
        if node.tag in ("h1", "h2", "h3", "p"):
            out.append(f"{node.tag.upper()}: {node.text_content()}")
    return out


def sessionize(extracted_text: list[str]) -> dict[str, str]:
    """E7: the reference's heading→section fold, reproduced exactly.

    ``flush_extracted_text`` (scrape_pp.py:26-47): consecutive headings chain
    with " -> ", consecutive paragraphs join with a space (stripping the
    appended one), a section is flushed only on a CONTENT→HEADING transition —
    so the trailing section is dropped, and the first heading run starts from
    key "" with prev primed to "H1". Quirks preserved on purpose.
    """
    prev = "H1"
    key = ""
    value = ""
    text_content: dict[str, str] = {}
    for text in extracted_text:
        tag, content = text.split(":", 1)
        if prev in HEADINGS and tag in HEADINGS:
            key += f" -> {content}"
        elif prev in CONTENT and tag in CONTENT:
            value += f" {content.strip()}"
        elif prev in HEADINGS and tag in CONTENT:
            value += content
        elif prev in CONTENT and tag in HEADINGS:
            text_content[key] = value
            key = content
            value = ""
        prev = tag
    return text_content
