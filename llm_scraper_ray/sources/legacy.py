"""Legacy-format ingestion: the reference's on-disk rows → Arrow tables.

A user of the reference has newline-delimited Python-literal files:
extracted-content rows ``"{dict} url"`` (``scrape_eccomerce.py:328``,
re-parsed at ``analysis/entity_analysis.py:87-114`` — E16/S2), raw triplet
rows ``"(...triplet...) <weight> <url> <datetime>"``
(``scrape_eccomerce.py:285``), and validated 4-tuple rows
(``data/validated_triplets``). These readers migrate that data into this
engine's Arrow tables so existing pipelines can switch repos without
re-scraping. Parsing uses ``ast.literal_eval`` exactly like the reference's
consumers (literals only — no code execution) plus the E17 regex grammar.
"""

from __future__ import annotations

import ast
import re

import pyarrow as pa

from ..functions.triplets import parse_triplets

# entity_analysis.py:87-114 — url tail after the last space; dict head
_URL_TAIL = re.compile(r"\s(https?://\S+)\s*$")


def parse_content_line(line: str) -> tuple[dict[str, str], str] | None:
    """E16 — one extracted-content row → (fields dict, url); None if
    malformed (the reference skips bad rows the same way)."""
    m = _URL_TAIL.search(line)
    if not m:
        return None
    url = m.group(1)
    head = line[: m.start()].strip()
    try:
        obj = ast.literal_eval(head)
    except (ValueError, SyntaxError):
        return None
    if not isinstance(obj, dict):
        return None
    return {str(k): str(v) for k, v in obj.items()}, url


def read_extracted_rows(lines) -> pa.Table:
    """extracted-content lines → table(url, fields: map<string,string>)."""
    urls, fields = [], []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        parsed = parse_content_line(line)
        if parsed is None:
            continue
        f, url = parsed
        urls.append(url)
        fields.append(list(f.items()))
    return pa.Table.from_pydict(
        {
            "url": pa.array(urls, pa.string()),
            "fields": pa.array(fields, pa.map_(pa.string(), pa.string())),
        }
    )


def read_raw_triplet_lines(lines) -> pa.Table:
    """raw triplet rows "(trip) weight url datetime" → flat triplet table."""
    out = {
        "subj_type": [], "subj_name": [], "pred": [], "obj_type": [],
        "obj_name": [], "weight": [], "url": [], "ts": [],
    }
    for line in lines:
        line = line.strip()
        if not line:
            continue
        trips = parse_triplets(line)
        if len(trips) != 1:
            continue
        tail = line[line.rindex("))") + 2 :].split()
        if len(tail) < 2:
            continue
        try:
            weight = float(tail[0])
        except ValueError:
            continue
        url = tail[1]
        ts = " ".join(tail[2:]) if len(tail) > 2 else ""
        (st, sn), p, (ot, on) = trips[0]
        out["subj_type"].append(st)
        out["subj_name"].append(sn)
        out["pred"].append(p)
        out["obj_type"].append(ot)
        out["obj_name"].append(on)
        out["weight"].append(weight)
        out["url"].append(url)
        out["ts"].append(ts)
    return pa.Table.from_pydict(
        {
            **{k: pa.array(v, pa.string()) for k, v in out.items() if k not in ("weight",)},
            "weight": pa.array(out["weight"], pa.float64()),
        }
    )


def read_validated_triplet_lines(lines) -> pa.Table:
    """validated 4-tuple rows ``(subj, pred, obj, weight)``
    (``KG.py:54-61,459-462``) → flat triplet table."""
    out = {
        "subj_type": [], "subj_name": [], "pred": [], "obj_type": [],
        "obj_name": [], "weight": [],
    }
    for line in lines:
        line = line.strip()
        if not line:
            continue
        try:
            obj = ast.literal_eval(line)
        except (ValueError, SyntaxError):
            continue
        if not (isinstance(obj, tuple) and len(obj) == 4):
            continue
        (st, sn), p, (ot, on) = obj[0], obj[1], obj[2]
        out["subj_type"].append(str(st))
        out["subj_name"].append(str(sn))
        out["pred"].append(str(p))
        out["obj_type"].append(str(ot))
        out["obj_name"].append(str(on))
        out["weight"].append(float(obj[3]))
    return pa.Table.from_pydict(
        {
            **{k: pa.array(v, pa.string()) for k, v in out.items() if k != "weight"},
            "weight": pa.array(out["weight"], pa.float64()),
        }
    )
