"""Multimodal content scrape + module product parsers (SURVEY.md E4, E5).

Static restatement of ``util/scraper/content_scraper.py:9-106`` (text via a
per-site module, ``<code>`` texts as JSON, ``<img>``/``<source>`` srcs,
``<video>`` srcs) and the hardcoded Amazon product parser
(``util/scraper/modules/amazon.py:96-168``), over the stdlib DOM
(functions.dom) instead of bs4 — same outputs, no fetch.

The module registry mirrors ``scrapping_manager.py:7`` (``MODULES``): a
module is anything exposing ``parse_products(root) -> (product_str, url)``;
dispatch is by host (SURVEY.md §2.10).
"""

from __future__ import annotations

import json
from urllib.parse import urljoin

from .dom import Node, parse_dom, select, select_one


def _strip_text(node: Node | None) -> str | None:
    if node is None:
        return None
    # bs4 get_text(strip=True): per-node strip + join — for these flat
    # targets equivalent to whole-text strip of concatenated runs
    parts = [s.strip() for s in _iter_strings(node)]
    return " ".join(p for p in parts if p) or None


def _iter_strings(node: Node):
    stack: list = list(reversed(node.children))
    while stack:
        c = stack.pop()
        if isinstance(c, str):
            yield c
        else:
            stack.extend(reversed(c.children))


class GenericProductModule:
    """Product parser for the synthetic corpus templates (E4 shape):
    name ← h1.h4, manufacturer ← a.c-button-link, details ← ul bullets."""

    def parse_products(self, root: Node) -> tuple[str, str]:
        name = _strip_text(select_one(root, "h1.h4"))
        manufacturer = _strip_text(select_one(root, "a.c-button-link"))
        details = " | ".join(
            t for t in (_strip_text(li) for li in select(root, "div.mb-200 ul li")) if t
        )
        url_node = select_one(root, "link[rel=canonical]")
        url = url_node.attrs.get("href", "") if url_node else ""
        product = {"name": name, "manufacturer": manufacturer, "details": details}
        return str(product), url


class AmazonModule:
    """Fallback-chain parser mirroring ``modules/amazon.py:96-168``."""

    def parse_products(self, root: Node) -> tuple[str, str]:
        name = (
            _strip_text(select_one(root, "span.a-size-large.product-title-word-break"))
            or _strip_text(select_one(root, "div#title_feature_div"))
            or _strip_text(select_one(root, "span#title"))
        )
        manufacturer = None
        if select_one(root, "div.a-section.a-spacing-small.a-spacing-top-small") is not None:
            manufacturer = _strip_text(
                select_one(
                    root,
                    "table.a-normal.a-spacing-micro tr.a-spacing-small.po-brand "
                    "td.a-span9 span.a-size-base.po-break-word",
                )
            )
        if manufacturer is None:
            manufacturer = _strip_text(
                select_one(root, "a.a-color-base.a-link-normal.a-text-bold")
            )
        details = " | ".join(
            t
            for t in (
                _strip_text(e)
                for e in select(root, ".a-unordered-list.a-vertical.a-spacing-mini")
            )
            if t
        )
        if details == "":
            bullets = select_one(root, "div#feature-bullets")
            if bullets is not None:
                details = " | ".join(
                    t for t in (_strip_text(li) for li in select(bullets, "li")) if t
                )
        url_node = select_one(root, "link[rel=canonical]")
        url = url_node.attrs.get("href", "") if url_node else ""
        product = {"name": name, "manufacturer": manufacturer, "details": details}
        return str(product), url


MODULES = {"generic": GenericProductModule(), "amazon": AmazonModule()}


def scrape_content(html: str | bytes, base_url: str, module_name: str = "generic") -> dict:
    """E5 — one parse producing struct columns {text, images, code, videos}
    (``content_scraper.py:9-106``)."""
    root = parse_dom(html)
    module = MODULES.get(module_name, MODULES["generic"])
    text_content, _ = module.parse_products(root)

    code_content = json.dumps(
        ["".join(_iter_strings(c)).strip() for c in select(root, "code")]
    )
    images: list[str] = []
    for img in select(root, "img"):
        src = img.attrs.get("src")
        if src:
            images.append(src)
        for source in select(img, "source"):
            s = source.attrs.get("src")
            if s:
                images.append(s)
    videos: list[str] = []
    for video in select(root, "video"):
        src = video.attrs.get("src")
        if src:
            videos.append(urljoin(base_url, src))
        for source in select(video, "source"):
            s = source.attrs.get("src")
            if s:
                videos.append(urljoin(base_url, s))
    return {"text": text_content, "images": images, "code": code_content, "videos": videos}


def image_refs(html: str | bytes) -> list[tuple[str, str]]:
    """E4 — ``<img>`` (src, alt) pairs for the M4 image-analysis chain
    (``image_analysis.py:19-36`` iterates the page's scraped image list;
    the alt text stands in for the pixels our shims can't decode)."""
    out: list[tuple[str, str]] = []
    for img in select(parse_dom(html), "img"):
        src = img.attrs.get("src")
        if src:
            out.append((src, img.attrs.get("alt") or ""))
    return out
