"""URL canonicalization, hashing and host parsing (SURVEY.md F15).

The reference only partially canonicalizes URLs (``<link rel=canonical>``
extraction in ``util/scraper/modules/amazon.py:156-160`` and ``urljoin``
absolutization in ``util/scraper/content_scraper.py:93``); its URL-seen sets
(``extract_product_urls.py:12,39-41``) compare raw strings. At 10^10-URL
frontier scale raw-string identity misses trivial variants, so this engine
makes full RFC 3986 syntax-based normalization explicit and keys *everything*
(seen set, dedup shuffles, partitioning) on ``sha1(canonical_url)``.

Normalization applied (RFC 3986 §6.2.2, syntax-based only):
  - scheme and host lowercased; userinfo preserved
  - default ports stripped (http:80, https:443)
  - fragment removed
  - dot-segments removed from the path (RFC 3986 §5.2.4)
  - percent-encoding: unreserved octets decoded, other triplets uppercased,
    raw disallowed characters encoded
  - empty path → "/" when an authority is present
  - query preserved (parameter order is significant per RFC)

Only http/https URLs are canonicalizable; anything else (mailto:, javascript:,
data:, relative refs) returns ``None`` — the frontier filters these, the
analog of the reference's domain/path URL filter
(``util/scraper/search_scraper.py:85-98``, SURVEY.md F14).
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_SUB_DELIMS = "!$&'()*+,;="
# pchar = unreserved / pct-encoded / sub-delims / ":" / "@"
_PATH_SAFE = _UNRESERVED | set(_SUB_DELIMS) | set(":@/")
_QUERY_SAFE = _PATH_SAFE | set("?")
_HEX = "0123456789ABCDEF"


def _normalize_pct(component: str, safe: frozenset | set) -> str:
    """Normalize percent-encoding in one URL component.

    Decodes %XX triplets whose octet is unreserved, uppercases the hex of all
    other triplets, and percent-encodes raw characters outside ``safe``.
    Malformed escapes ("%" not followed by two hex digits) are encoded as %25.
    """
    out = []
    i, n = 0, len(component)
    while i < n:
        ch = component[i]
        if ch == "%":
            hx = component[i + 1 : i + 3]
            if len(hx) == 2 and all(c in "0123456789abcdefABCDEF" for c in hx):
                octet = chr(int(hx, 16))
                if octet in _UNRESERVED:
                    out.append(octet)
                else:
                    out.append("%" + hx.upper())
                i += 3
                continue
            out.append("%25")
            i += 1
            continue
        if ch in safe:
            out.append(ch)
        else:
            for b in ch.encode("utf-8"):
                out.append("%" + _HEX[b >> 4] + _HEX[b & 0xF])
        i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    output: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if output:
                output.pop()
        elif buf == "/..":
            buf = "/"
            if output:
                output.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            if buf.startswith("/"):
                slash = buf.find("/", 1)
            else:
                slash = buf.find("/")
            if slash == -1:
                output.append(buf)
                buf = ""
            else:
                output.append(buf[:slash])
                buf = buf[slash:]
    return "".join(output)


def canonicalize_url(url: str) -> str | None:
    """Return the canonical form of an absolute http(s) URL, else ``None``."""
    if not url:
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc
    if not netloc:
        return None
    userinfo, sep, hostport = netloc.rpartition("@")
    if hostport.startswith("["):
        # IPv6 literal: "[addr]" or "[addr]:port" — a bare partition(":")
        # would mangle it into host "[" + garbage port (ADVICE r01)
        end = hostport.find("]")
        if end == -1:
            return None
        host = hostport[: end + 1].lower()
        rest = hostport[end + 1 :]
        if rest == "":
            port = ""
        elif rest.startswith(":"):
            port = rest[1:]
        else:
            return None
    else:
        host, _, port = hostport.partition(":")
        host = host.lower().rstrip(".")
    if not host:
        return None
    if port == _DEFAULT_PORTS.get(scheme) or port == "":
        port = ""
    authority = (userinfo + sep if sep else "") + host + (":" + port if port else "")
    path = _normalize_pct(parts.path, _PATH_SAFE)
    path = _remove_dot_segments(path)
    if not path:
        path = "/"
    out = f"{scheme}://{authority}{path}"
    if parts.query:
        out += "?" + _normalize_pct(parts.query, _QUERY_SAFE)
    return out


def url_sha1(canonical_url: str) -> bytes:
    """20-byte SHA-1 of the canonical URL — the engine's partition key."""
    return hashlib.sha1(canonical_url.encode("utf-8")).digest()


def url_sha1_hex(canonical_url: str) -> str:
    return hashlib.sha1(canonical_url.encode("utf-8")).hexdigest()


def host_of(canonical_url: str) -> str:
    """Host (no port, no userinfo) of an already-canonical URL."""
    rest = canonical_url.split("://", 1)[1]
    authority = rest.split("/", 1)[0].split("?", 1)[0]
    hostport = authority.rpartition("@")[2]
    if hostport.startswith("["):  # IPv6 literal incl. brackets
        return hostport[: hostport.find("]") + 1]
    return hostport.partition(":")[0]


def path_of(canonical_url: str) -> str:
    """Path component (leading '/') of an already-canonical URL."""
    rest = canonical_url.split("://", 1)[1]
    slash = rest.find("/")
    if slash == -1:
        return "/"
    return rest[slash:].split("?", 1)[0]
