"""Minimal DOM + CSS-selector subset for config-driven field extraction.

The reference extracts per-site fields with Playwright locators / bs4
``select`` over CSS selectors from site-config JSON
(``server/scripts/scrape_eccomerce.py:77-111``, ``extract_pages.py:40-74``,
``config_files/best_buy_config.json``). Those configs use only a small CSS
subset, which is exactly what this module implements over a lightweight DOM
built with the stdlib ``html.parser`` (no bs4/soupsieve dependency):

  supported:  tag, #id, .class (chained: ``div.a.b``), [attr], [attr=val],
              descendant combinator (space), child combinator (>),
              selector groups (comma)

``text_content`` mirrors the DOM ``textContent`` used by Playwright's
``locator.text_content()`` (``scrape_eccomerce.py:90``): the raw
concatenation of all descendant text nodes, entity-decoded, no added
separators, no stripping.
"""

from __future__ import annotations

from html.parser import HTMLParser

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_RAWTEXT = frozenset(("script", "style"))


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "order")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None", order: int):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []  # element nodes and text runs
        self.parent = parent
        self.order = order  # document order, for stable select() output

    # -- traversal ---------------------------------------------------------

    def iter_elements(self):
        """All descendant element nodes, document order, self excluded."""
        stack = [c for c in reversed(self.children) if isinstance(c, Node)]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(c for c in reversed(node.children) if isinstance(c, Node))

    def text_content(self) -> str:
        """DOM textContent: all descendant text runs concatenated verbatim."""
        out: list[str] = []
        stack: list[Node | str] = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(out)

    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document", {}, None, 0)
        self._stack = [self.root]
        self._n = 1

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs}, self._stack[-1], self._n)
        self._n += 1
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs}, self._stack[-1], self._n)
        self._n += 1
        self._stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag; ignore stray end tags
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data and self._stack[-1].tag not in _RAWTEXT:
            self._stack[-1].children.append(data)


def parse_dom(html: str | bytes) -> Node:
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root


# -- CSS selector subset ---------------------------------------------------


class _Simple:
    __slots__ = ("tag", "id", "classes", "attrs")

    def __init__(self, token: str):
        self.tag: str | None = None
        self.id: str | None = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None]] = []
        i, n = 0, len(token)
        while i < n:
            ch = token[i]
            if ch == "#":
                j = _seg_end(token, i + 1)
                self.id = token[i + 1 : j]
                i = j
            elif ch == ".":
                j = _seg_end(token, i + 1)
                self.classes.append(token[i + 1 : j])
                i = j
            elif ch == "[":
                j = token.index("]", i)
                body = token[i + 1 : j]
                if "=" in body:
                    k, _, v = body.partition("=")
                    self.attrs.append((k.strip(), v.strip().strip("\"'")))
                else:
                    self.attrs.append((body.strip(), None))
                i = j + 1
            else:
                j = _seg_end(token, i)
                self.tag = token[i:j].lower() or None
                i = j

    def matches(self, node: Node) -> bool:
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        if self.classes:
            have = node.classes
            if any(c not in have for c in self.classes):
                return False
        for k, v in self.attrs:
            if k not in node.attrs:
                return False
            if v is not None and node.attrs[k] != v:
                return False
        return True


def _seg_end(s: str, i: int) -> int:
    while i < len(s) and s[i] not in "#.[":
        i += 1
    return i


def _compile(selector: str) -> list[list[tuple[str, _Simple]]]:
    """selector group → list of chains; chain = [(combinator, simple), ...]"""
    chains = []
    for part in selector.split(","):
        part = part.strip()
        if not part:
            continue
        tokens = part.replace(">", " > ").split()
        chain: list[tuple[str, _Simple]] = []
        comb = " "
        for tok in tokens:
            if tok == ">":
                comb = ">"
                continue
            chain.append((comb, _Simple(tok)))
            comb = " "
        if chain:
            chains.append(chain)
    return chains


def select(root: Node, selector: str) -> list[Node]:
    """All elements under ``root`` matching the selector group, doc order."""
    found: dict[int, Node] = {}
    for chain in _compile(selector):
        current: list[Node] = [root]
        for comb, simple in chain:
            nxt: dict[int, Node] = {}
            for base in current:
                if comb == ">":
                    candidates = (c for c in base.children if isinstance(c, Node))
                else:
                    candidates = base.iter_elements()
                for cand in candidates:
                    if simple.matches(cand):
                        nxt[cand.order] = cand
            current = [nxt[k] for k in sorted(nxt)]
        for node in current:
            found[node.order] = node
    return [found[k] for k in sorted(found)]


def select_one(root: Node, selector: str) -> Node | None:
    result = select(root, selector)
    return result[0] if result else None
